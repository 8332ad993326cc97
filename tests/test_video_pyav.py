"""PyAVReader semantics tests with a stubbed ``av`` module.

The real PyAV is absent in this image, but the reorder / missing-frame-fill
/ seek-retry logic is exactly what the reader exists for (reference
diva_io/video/reader.py:224-300) — so we fake the container: frames carry
pts in decode order, packets decode to frames, seek positions demuxing at
the nearest keyframe. Frame pixels encode the pts so tests can assert which
container frame each read() returned.
"""

import sys
import types
from fractions import Fraction

import numpy as np
import pytest


def _fake_av(pts_decode_order, num_frames=None, fail_seek_above=None,
             keyframe_every=10):
    av = types.ModuleType("av")

    class FakeFrame:
        def __init__(self, pts):
            self.pts = pts

        def to_ndarray(self, format="bgr24"):
            a = np.full((4, 4, 3), self.pts % 256, np.uint8)
            return a

    class FakePacket:
        def __init__(self, frames):
            self._frames = frames

        def decode(self):
            return self._frames

    class FakeStream:
        def __init__(self, n):
            self.frames = n
            self.average_rate = Fraction(30, 1)
            self.time_base = Fraction(1, 30)

    class FakeContainer:
        def __init__(self):
            self.pts_list = list(pts_decode_order)
            self._stream = FakeStream(num_frames or len(self.pts_list))
            self.streams = types.SimpleNamespace(video=[self._stream])
            self._start = 0
            self.closed = False

        def seek(self, pts, stream=None, **kw):
            if fail_seek_above is not None and pts > fail_seek_above:
                # simulate a broken index: seeking here decodes nothing
                self._start = 10 ** 9
            else:
                self._start = (pts // keyframe_every) * keyframe_every

        def demux(self, stream=None):
            for pts in self.pts_list:
                if pts >= self._start:
                    yield FakePacket([FakeFrame(pts)])

        def close(self):
            self.closed = True

    av.open = lambda path: FakeContainer()
    av.AVError = Exception
    return av


@pytest.fixture()
def pyav_reader(monkeypatch):
    def make(pts, **kw):
        monkeypatch.setitem(sys.modules, "av", _fake_av(pts, **kw))
        from object_detection_tracking_tpu.data.video import PyAVReader
        return PyAVReader("fake.avi")
    return make


def _read_values(r, n):
    vals = []
    for _ in range(n):
        ok, frame = r.read()
        if not ok:
            break
        vals.append(int(frame[0, 0, 0]))
    return vals


def test_reorder_out_of_order_pts(pyav_reader):
    # bidirectional packets: decode order != presentation order
    r = pyav_reader([0, 2, 1, 4, 3, 5, 7, 6, 8, 9])
    assert _read_values(r, 20) == list(range(10))


def test_fix_missing_duplicates_previous_frame(pyav_reader):
    r = pyav_reader([0, 1, 4, 5], num_frames=6)
    # frames 2, 3 are missing -> filled with copies of frame 1
    assert _read_values(r, 10) == [0, 1, 1, 1, 4, 5]


def test_fix_missing_leading_gap_uses_next_frame(pyav_reader):
    # first decodable frame is 2 (reference _fix_missing backfills from it)
    r = pyav_reader([2, 3, 4])
    assert _read_values(r, 10) == [2, 2, 2, 3, 4]


def test_duplicate_pts_dropped(pyav_reader):
    r = pyav_reader([0, 1, 1, 2, 3])
    assert _read_values(r, 10) == [0, 1, 2, 3]


def test_seek_lands_on_exact_frame(pyav_reader):
    r = pyav_reader(list(range(30)))
    r.seek(17)
    assert _read_values(r, 3) == [17, 18, 19]
    # seek backward works too (container reopens/repositions)
    r.seek(4)
    assert _read_values(r, 2) == [4, 5]
    r.seek(0)
    assert _read_values(r, 2) == [0, 1]


def test_seek_retry_backstep(pyav_reader):
    # seeking to pts > 15 decodes nothing (broken index past the last
    # keyframe); the reader must step back and still deliver frame 20
    r = pyav_reader(list(range(30)), fail_seek_above=15)
    r.seek(20, retry=5, retry_step=6)
    assert _read_values(r, 3) == [20, 21, 22]


def test_seek_raises_after_retries_exhausted(pyav_reader):
    r = pyav_reader(list(range(30)), fail_seek_above=-1)
    with pytest.raises(RuntimeError):
        r.seek(20, retry=2, retry_step=1)


def test_seek_into_missing_region_returns_fill(pyav_reader):
    # frames 10..14 missing; after a seek there is no previous frame, so
    # the gap backfills from the NEXT decodable frame (reference
    # _fix_missing: first frame 15 > start 12 -> _fix_missing_one with
    # src_frame=15, reader.py:246-258)
    pts = list(range(10)) + list(range(15, 30))
    r = pyav_reader(pts, num_frames=30)
    r.seek(12, retry_step=3)
    vals = _read_values(r, 4)
    assert vals == [15, 15, 15, 15]
    # sequential read through the same gap fills from the PREVIOUS frame
    r.seek(8, retry_step=3)
    assert _read_values(r, 4) == [8, 9, 9, 9]
