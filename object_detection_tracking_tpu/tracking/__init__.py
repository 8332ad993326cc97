"""Multi-object tracking: Deep SORT and TMOT/JDE trackers.

Trackers run host-side on numpy (they are a few hundred small ops per frame
— device round-trips would cost more than the math), consuming detections
and appearance embeddings that the detector already pooled on-device.
Assignment uses scipy's Hungarian solver with an optional C++ lapjv
(native/) fast path.
"""

from .deep_sort.tracker import Tracker  # noqa: F401
from .deep_sort import nn_matching  # noqa: F401
