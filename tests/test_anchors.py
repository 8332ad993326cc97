import numpy as np

from object_detection_tracking_tpu.ops import anchors as A


def test_base_anchors_legacy_values():
    """Golden values from the caffe/tensorpack anchor code with base 16,
    ratios (0.5, 1, 2), scales (8, 16, 32) (generate_anchors.py:105-110)."""
    anchors = A.generate_base_anchors(16, (0.5, 1, 2), (8, 16, 32))
    want = np.array([
        [-84., -40., 99., 55.],
        [-176., -88., 191., 103.],
        [-360., -184., 375., 199.],
        [-56., -56., 71., 71.],
        [-120., -120., 135., 135.],
        [-248., -248., 263., 263.],
        [-36., -80., 51., 95.],
        [-80., -168., 95., 183.],
        [-168., -344., 183., 359.],
    ], np.float32)
    np.testing.assert_allclose(anchors, want)


def test_dense_field_shape_and_shift():
    field = A.get_all_anchors(16, [64], (0.5, 1, 2), (4, 6))
    assert field.shape == (4, 6, 3, 4)
    # translation invariance: cell (1, 2) = cell (0, 0) + (32, 16) shift
    np.testing.assert_allclose(
        field[1, 2] - field[0, 0],
        np.tile([[32.0, 16.0, 32.0, 16.0]], (3, 1)))
    # the legacy +1 makes x2/y2 exclusive, so the ratio-1 anchor's float
    # width equals its nominal size exactly
    sq = field[0, 0, 1]
    w = sq[2] - sq[0]
    h = sq[3] - sq[1]
    assert w == h == 64.0
    # centered on stride/2 = 8
    assert (sq[0] + sq[2]) / 2 == (sq[1] + sq[3]) / 2 == 8.0


def test_fpn_fields():
    fields = A.get_all_anchors_fpn(
        (4, 8, 16, 32, 64), (32, 64, 128, 256, 512), (0.5, 1, 2), (128, 256))
    assert len(fields) == 5
    assert fields[0].shape == (32, 64, 3, 4)
    assert fields[4].shape == (2, 4, 3, 4)
