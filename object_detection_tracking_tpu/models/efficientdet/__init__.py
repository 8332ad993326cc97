"""EfficientDet detector family (d0-d4), TPU-native.

Second detector path with the same output contract as FasterRCNNFPN
(reference efficientdet_wrapper.py + vendored google/automl efficientdet/):
EfficientNet backbone -> BiFPN (fast-attention fusion) -> shared separable
class/box heads over P3-P7 -> sigmoid + per-level top-k -> decode -> exact
static NMS -> level-indexed ROIAlign tracking features.

Weight conversion note: reference checkpoints are TF1 ckpt format, which
needs TensorFlow to read — absent in this image. utils/weights.py documents
the offline conversion recipe; this module's numerics (anchors, decode,
NMS, resampling) are golden-tested directly.
"""

from .efficientdet import EfficientDet, EFFICIENTDET_CONFIGS  # noqa: F401
from .anchors import effdet_anchors, decode_effdet_boxes  # noqa: F401
