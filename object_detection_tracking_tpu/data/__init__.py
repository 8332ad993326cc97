"""Host data plane: video decode, prefetch enqueuers, image datasets.

Design (reference enqueuer_thread.py / diva_io, rebuilt for TPU feeding):
decode + resize run in host threads; batches flow through a bounded queue;
the runtime layer (runtime/runner.py) overlaps host->HBM transfers with
device compute so the chip never waits on the decoder.
"""

from .video import VideoReader, open_video  # noqa: F401
from .enqueuer import VideoEnqueuer, DatasetEnqueuer  # noqa: F401
from .datasets import ImageDataset  # noqa: F401
