"""Pure-functional ops: box math, anchors, ROIAlign, NMS, norms.

All device ops are jax-traceable with static shapes; numpy twins (suffix
``_np``) exist for host-side use and for golden unit tests.
"""

from .boxes import (  # noqa: F401
    pairwise_iou,
    pairwise_iou_np,
    encode_boxes,
    decode_boxes,
    clip_boxes,
    get_new_hw,
    xyxy_to_tlwh,
    tlwh_to_xyxy,
    tlwh_to_xyah,
)
from .anchors import generate_base_anchors, get_all_anchors  # noqa: F401
