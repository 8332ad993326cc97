import numpy as np
import jax.numpy as jnp

from object_detection_tracking_tpu.ops import boxes as B


def rand_boxes(n, size=100.0, seed=0):
    rng = np.random.RandomState(seed)
    x1y1 = rng.uniform(0, size * 0.8, (n, 2))
    wh = rng.uniform(1, size * 0.2, (n, 2))
    return np.concatenate([x1y1, x1y1 + wh], axis=1).astype(np.float32)


def test_iou_jax_matches_np():
    b1, b2 = rand_boxes(7, seed=1), rand_boxes(5, seed=2)
    got = np.asarray(B.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    want = B.pairwise_iou_np(b1, b2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_iou_identity():
    b = rand_boxes(4, seed=3)
    iou = B.pairwise_iou_np(b, b)
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-6)


def test_encode_decode_roundtrip():
    anchors = rand_boxes(16, seed=4)
    targets = rand_boxes(16, seed=5)
    enc = B.encode_boxes(jnp.asarray(targets), jnp.asarray(anchors))
    dec = B.decode_boxes(enc, jnp.asarray(anchors), decode_clip=10.0)
    np.testing.assert_allclose(np.asarray(dec), targets, atol=1e-3)


def test_decode_clip():
    anchors = np.array([[0, 0, 10, 10]], np.float32)
    deltas = np.array([[0, 0, 100.0, 100.0]], np.float32)  # huge log-wh
    dec = np.asarray(B.decode_boxes(
        jnp.asarray(deltas), jnp.asarray(anchors), decode_clip=np.log(2.0)))
    w = dec[0, 2] - dec[0, 0]
    np.testing.assert_allclose(w, 20.0, rtol=1e-5)  # exp(log 2) * 10


def test_clip_boxes():
    b = np.array([[-5, -5, 50, 200], [10, 10, 20, 20]], np.float32)
    c = np.asarray(B.clip_boxes(jnp.asarray(b), (100, 40)))
    np.testing.assert_allclose(c, [[0, 0, 40, 100], [10, 10, 20, 20]])


def test_get_new_hw_short_edge():
    # 1080p -> short edge 1080 cap 1920: identity
    assert B.get_new_hw(1080, 1920, 1080, 1920) == (1920, 1080)
    # 720p upscaled to short edge 1080 -> long edge hits 1920 cap
    neww, newh = B.get_new_hw(720, 1280, 1080, 1920)
    assert neww == 1920 and newh == 1080
    # portrait
    neww, newh = B.get_new_hw(1280, 720, 800, 1333)
    assert newh > neww


def test_tlwh_conversions():
    xyxy = np.array([[10, 20, 30, 60]], np.float32)
    tlwh = B.xyxy_to_tlwh(xyxy)
    np.testing.assert_allclose(tlwh, [[10, 20, 20, 40]])
    np.testing.assert_allclose(B.tlwh_to_xyxy(tlwh), xyxy)
    xyah = B.tlwh_to_xyah(tlwh)
    np.testing.assert_allclose(xyah, [[20, 40, 0.5, 40]])
