import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from object_detection_tracking_tpu.utils.masks import (fill_full_mask,
                                                       rle_decode, rle_encode)


def test_rle_roundtrip_random():
    rng = np.random.RandomState(0)
    for _ in range(10):
        m = (rng.rand(37, 53) > 0.6).astype(np.uint8)
        np.testing.assert_array_equal(rle_decode(rle_encode(m)), m)


def test_rle_roundtrip_edge_cases():
    for m in (np.zeros((5, 7), np.uint8), np.ones((5, 7), np.uint8),
              np.eye(8, dtype=np.uint8)):
        np.testing.assert_array_equal(rle_decode(rle_encode(m)), m)


def test_rle_known_counts():
    # 2x2 with first column 1s: column-major flat = [1,1,0,0]
    m = np.array([[1, 0], [1, 0]], np.uint8)
    rle = rle_encode(m)
    dec = rle_decode(rle)
    np.testing.assert_array_equal(dec, m)
    # leading zero run encoded since flat starts with 1
    assert rle["size"] == [2, 2]


def test_fill_full_mask_geometry():
    mask = np.ones((28, 28), np.float32)
    out = fill_full_mask([10, 20, 30, 40], mask, (60, 80))
    assert out.shape == (60, 80)
    assert out[30, 20] == 1          # inside the box
    assert out[10, 10] == 0          # outside
    ys, xs = np.nonzero(out)
    assert ys.min() >= 20 and ys.max() <= 39
    assert xs.min() >= 10 and xs.max() <= 29
