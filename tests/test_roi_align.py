import numpy as np
import jax.numpy as jnp

from object_detection_tracking_tpu.ops import roi_align as R


def test_crop_and_resize_matches_golden():
    rng = np.random.RandomState(0)
    feat = rng.randn(16, 20, 3).astype(np.float32)
    boxes = np.array([
        [2.0, 3.0, 10.0, 9.0],
        [0.0, 0.0, 20.0, 16.0],
        [-2.0, -2.0, 5.0, 5.0],    # partially out of range
        [15.0, 11.0, 25.0, 20.0],  # spills off bottom-right
    ], np.float32)
    got = np.asarray(R.crop_and_resize(jnp.asarray(feat), jnp.asarray(boxes), 7))
    want = R.crop_and_resize_np(feat, boxes, 7)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roi_align_is_2x_then_avgpool():
    rng = np.random.RandomState(1)
    feat = rng.randn(12, 12, 2).astype(np.float32)
    boxes = np.array([[1.0, 1.0, 9.0, 9.0]], np.float32)
    out = np.asarray(R.roi_align(jnp.asarray(feat), jnp.asarray(boxes), 3))
    crop = R.crop_and_resize_np(feat, boxes, 6)
    want = crop.reshape(1, 3, 2, 3, 2, 2).mean(axis=(2, 4))
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_fpn_level_assignment():
    # sqrt-area 224 at scale 1 -> level 4 (p4 -> index 2)
    boxes = np.array([
        [0, 0, 224, 224],     # lvl 4 -> idx 2
        [0, 0, 56, 56],       # lvl 2 -> idx 0
        [0, 0, 112, 112],     # lvl 3 -> idx 1
        [0, 0, 448, 448],     # lvl 5 -> idx 3
        [0, 0, 10000, 10000], # clipped to idx 3
        [0, 0, 4, 4],         # clipped to idx 0
    ], np.float32)
    lvl = np.asarray(R.fpn_map_rois_to_levels(jnp.asarray(boxes)))
    np.testing.assert_array_equal(lvl, [2, 0, 1, 3, 3, 0])


def test_multilevel_matches_single_level():
    """A small box lands on p2; multilevel output must equal single-level
    roi_align on p2 with stride-4 scaled coords."""
    rng = np.random.RandomState(2)
    feats = [rng.randn(32 // (2 ** i), 40 // (2 ** i), 4).astype(np.float32)
             for i in range(4)]
    strides = (4, 8, 16, 32)
    boxes = np.array([[8.0, 8.0, 72.0, 60.0]], np.float32)  # sqrt-area ~58 -> p2
    got = np.asarray(R.multilevel_roi_align(
        [jnp.asarray(f) for f in feats], jnp.asarray(boxes), strides, 7))
    want = np.asarray(R.roi_align(jnp.asarray(feats[0]),
                                  jnp.asarray(boxes / 4.0), 7))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_multilevel_upper_level():
    rng = np.random.RandomState(3)
    feats = [rng.randn(64 // (2 ** i), 64 // (2 ** i), 4).astype(np.float32)
             for i in range(4)]
    strides = (4, 8, 16, 32)
    boxes = np.array([[0.0, 0.0, 500.0, 500.0]], np.float32)  # -> p5 (idx 3)
    got = np.asarray(R.multilevel_roi_align(
        [jnp.asarray(f) for f in feats], jnp.asarray(boxes), strides, 7))
    want = np.asarray(R.roi_align(jnp.asarray(feats[3]),
                                  jnp.asarray(boxes / 32.0), 7))
    np.testing.assert_allclose(got, want, atol=1e-4)
