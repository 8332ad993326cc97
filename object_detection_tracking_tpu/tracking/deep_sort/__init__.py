"""Deep SORT: appearance-gated matching-cascade multi-object tracker.

Behavioral parity with the reference deep_sort/ package (tracker.py,
linear_assignment.py, nn_matching.py, iou_matching.py, track.py,
detection.py, utils.py), reimplemented host-side with the shared Kalman
filter in tracking/kalman.py and on-device-pooled appearance embeddings.
"""

from .detection import Detection  # noqa: F401
from .tracker import Tracker  # noqa: F401
from .utils import (create_obj_infos, det_level_nms,  # noqa: F401
                    filter_short_objs, linear_inter_bbox, link_tracklets)
