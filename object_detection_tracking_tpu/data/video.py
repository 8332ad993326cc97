"""Video reading with frame-index fidelity.

The reference ships diva_io (PyAV) because OpenCV silently skips duplicated
frames in some AVI files, desynchronizing frame indices from annotations
(diva_io/video/reader.py:246-300). We provide:

  * ``PyAVReader`` — demux/decode via av with *frame reordering* (bounded
    heap on pts order) and *missing-frame fill* (duplicate the previous
    frame), the same repair semantics as diva_io. Used when ``av`` is
    importable (not in this image; gated).
  * ``CV2Reader`` — cv2.VideoCapture fallback, cv2-compatible semantics.

Both expose the cv2-style API: ``read() -> (ok, frame_bgr)``, ``num_frames``,
``fps``, ``release()``.
"""

from __future__ import annotations

import heapq
from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

try:
    import av  # noqa: F401
    _HAS_AV = True
except ImportError:
    _HAS_AV = False


class VideoReader:
    """Abstract reader interface."""

    num_frames: int = 0
    fps: float = 0.0

    def read(self) -> Tuple[bool, Optional[np.ndarray]]:
        raise NotImplementedError

    def grab(self) -> bool:
        """Advance one frame without returning pixels (cheaper than read
        for frame-gap skipping; falls back to read)."""
        ok, _ = self.read()
        return ok

    def release(self):
        pass

    def __iter__(self):
        while True:
            ok, frame = self.read()
            if not ok:
                return
            yield frame


class CV2Reader(VideoReader):
    def __init__(self, path: str):
        if cv2 is None:
            raise RuntimeError("cv2 not available")
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise IOError(f"cannot open video {path}")
        self.num_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.fps = float(self.cap.get(cv2.CAP_PROP_FPS)) or 30.0

    def read(self):
        ok, frame = self.cap.read()
        return ok, frame

    def grab(self):
        return self.cap.grab()

    def release(self):
        self.cap.release()


class PyAVReader(VideoReader):
    """PyAV-based reader with reordering + missing-frame fill.

    Frames can arrive out of presentation order and with pts gaps; we keep a
    small heap keyed on frame index (pts / pts_unit), emit in order, and
    duplicate the previous frame to fill index gaps — so ``read()`` number i
    always corresponds to container frame index i (diva_io semantics).
    """

    BUFFER = 5

    def __init__(self, path: str, fix_missing: bool = True):
        import av
        self.container = av.open(path)
        self.stream = self.container.streams.video[0]
        self.fix_missing = fix_missing
        self.fps = float(self.stream.average_rate or 30.0)
        self.num_frames = int(self.stream.frames or 0)
        rate = self.stream.average_rate
        tb = self.stream.time_base
        self._pts_unit = (1 / (tb * rate)) if (tb and rate) else None
        self._decode_iter = self.container.decode(video=0)
        self._heap = []  # (frame_idx, serial, ndarray)
        self._serial = 0
        self._next_idx = 0
        self._last_frame = None
        self._eof = False

    def _frame_index(self, frame) -> int:
        if self._pts_unit and frame.pts is not None:
            return int(round(frame.pts / self._pts_unit))
        return self._next_idx + len(self._heap)

    def _fill_heap(self):
        while not self._eof and len(self._heap) < self.BUFFER:
            try:
                frame = next(self._decode_iter)
            except (StopIteration, Exception):
                self._eof = True
                return
            idx = self._frame_index(frame)
            arr = frame.to_ndarray(format="bgr24")
            heapq.heappush(self._heap, (idx, self._serial, arr))
            self._serial += 1

    def read(self):
        self._fill_heap()
        if not self._heap:
            return False, None
        idx, _, arr = self._heap[0]
        if idx > self._next_idx and self.fix_missing and \
                self._last_frame is not None:
            # fill the gap by duplicating the previous frame
            self._next_idx += 1
            return True, self._last_frame.copy()
        heapq.heappop(self._heap)
        self._next_idx = max(self._next_idx, idx) + 1
        self._last_frame = arr
        return True, arr

    def release(self):
        try:
            self.container.close()
        except Exception:
            pass


def open_video(path: str, decoder: str = "auto") -> VideoReader:
    """decoder: auto | cv2 | pyav (reference --use_lijun_video_loader)."""
    if decoder == "pyav" or (decoder == "auto" and _HAS_AV and
                             path.lower().endswith(".avi")):
        if not _HAS_AV:
            raise RuntimeError("pyav decoder requested but av not installed")
        return PyAVReader(path)
    return CV2Reader(path)
