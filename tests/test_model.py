import numpy as np
import jax
import pytest

from object_detection_tracking_tpu.config import DetectorConfig
from object_detection_tracking_tpu.models import get_model


@pytest.fixture(scope="module")
def tiny():
    cfg = DetectorConfig(
        num_class=4, resnet_depth=18, short_edge_size=64, max_size=128,
        rpn_test_post_nms_topk=32, result_per_im=8, compute_dtype="float32")
    m = get_model(cfg)
    params = m.init_params(jax.random.PRNGKey(0))
    return cfg, m, params


def test_forward_shapes(tiny):
    cfg, m, params = tiny
    imgs = np.random.RandomState(0).randint(
        0, 255, (1, 48, 72, 3)).astype(np.uint8)
    out = m.forward(params, imgs)
    r = cfg.result_per_im
    assert out["final_boxes"].shape == (1, r, 4)
    assert out["final_labels"].shape == (1, r)
    assert out["final_probs"].shape == (1, r)
    assert out["final_valid"].shape == (1, r)
    assert out["fpn_box_feat"].shape == (1, r, 7, 7, cfg.fpn_num_channel)
    # boxes inside image
    fb = np.asarray(out["final_boxes"])
    assert fb.min() >= 0 and fb[..., 0::2].max() <= 72 and fb[..., 1::2].max() <= 48
    # labels in range for valid dets
    fl = np.asarray(out["final_labels"])
    fv = np.asarray(out["final_valid"])
    assert ((fl[fv] >= 1) & (fl[fv] < cfg.num_class)).all()


def test_batch_equals_single(tiny):
    """Batched forward must equal per-image forwards (the reference needed a
    whole separate Mask_RCNN_FPN_multi class for this; here it's vmap)."""
    cfg, m, params = tiny
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 255, (2, 48, 72, 3)).astype(np.uint8)
    out_b = m.forward(params, imgs)
    out_0 = m.forward(params, imgs[0:1])
    out_1 = m.forward(params, imgs[1:2])
    for k in ("final_boxes", "final_probs"):
        np.testing.assert_allclose(
            np.asarray(out_b[k][0]), np.asarray(out_0[k][0]),
            atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(out_b[k][1]), np.asarray(out_1[k][0]),
            atol=1e-3, rtol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(out_b["final_labels"][0]), np.asarray(out_0["final_labels"][0]))


def test_backbone_geometry(tiny):
    """c2..c5/p2..p6 extents follow the exact pad-to-multiple geometry."""
    cfg, m, params = tiny
    imgs = np.zeros((1, 48, 72, 3), np.uint8)
    hp, wp, fields, valids = m._static_geometry(48, 72)
    assert (hp, wp) == (64, 96)
    p = m.backbone(params, m.preprocess(jax.numpy.asarray(imgs), hp, wp))
    assert [x.shape[1:3] for x in p] == [
        (16, 24), (8, 12), (4, 6), (2, 3), (1, 2)]
    # anchor fields match feature extents
    for lvl, f in enumerate(fields):
        assert f.shape[:2] == tuple(p[lvl].shape[1:3])
    # pad-region mask: image (48, 72) -> ceil/4 = (12, 18) valid cells at p2
    assert valids[0][:12, :18].all()
    assert not valids[0][12:, :].any() and not valids[0][:, 18:].any()


def test_small_object_head_outputs():
    """SO refinement heads (models.py:592-691): per-SO-class NMS + shared-fc
    2-way classification + person association; labels index the
    config.small_objects list (1-based)."""
    cfg = DetectorConfig(
        num_class=16, resnet_depth=18, short_edge_size=64, max_size=128,
        rpn_test_post_nms_topk=32, result_per_im=8, compute_dtype="float32",
        use_small_object_head=True, use_so_association=True)
    m = get_model(cfg)
    params = m.init_params(jax.random.PRNGKey(0))
    imgs = np.random.RandomState(5).randint(
        0, 255, (1, 48, 72, 3)).astype(np.uint8)
    out = m.forward(params, imgs)
    n_so = len([n for n in cfg.small_objects if n in cfg.classname2id])
    assert out["so_final_boxes"].shape == (1, 8, 4)
    fl = np.asarray(out["so_final_labels"])
    fv = np.asarray(out["so_final_valid"])
    assert ((fl[fv] >= 1) & (fl[fv] <= n_so)).all()
    fb = np.asarray(out["so_final_boxes"])
    assert fb[..., 0::2].max() <= 72 and fb[..., 1::2].max() <= 48


def test_stem_s2d_matches_direct_conv():
    """Space-to-depth stem == direct 7x7/2 conv (resnet.py:_stem_conv_s2d
    rearranges the same 147 MACs; ~5x faster on the MXU)."""
    import jax.numpy as jnp
    from object_detection_tracking_tpu.models.resnet import _stem_conv_s2d
    from object_detection_tracking_tpu.models.layers import conv2d
    rng = np.random.RandomState(0)
    params = {"W": jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32))}
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    a = _stem_conv_s2d(params, x)
    b = conv2d(params, x, stride=2, padding=((3, 2), (3, 2)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-4, rtol=1e-5)
    # odd extents fall back to the direct conv
    x_odd = jnp.asarray(rng.randn(2, 63, 96, 3).astype(np.float32))
    c = _stem_conv_s2d(params, x_odd)
    d = conv2d(params, x_odd, stride=2, padding=((3, 2), (3, 2)))
    np.testing.assert_allclose(np.asarray(c), np.asarray(d),
                               atol=2e-4, rtol=1e-5)


def test_preprocess_s2d_matches_flat():
    """preprocess(s2d=True) emits the space-to-depth layout of EXACTLY the
    flat preprocess output (transpose commutes with normalize; padding
    unchanged) — the fused path that avoids 3 ms of layout copies."""
    from object_detection_tracking_tpu.config import DetectorConfig
    from object_detection_tracking_tpu.models import get_model
    cfg = DetectorConfig(num_class=4, resnet_depth=18, short_edge_size=48,
                         max_size=64, compute_dtype="float32")
    m = get_model(cfg)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (2, 44, 60, 3)).astype(np.uint8)
    flat = np.asarray(m.preprocess(img, 64, 64))          # [2, 64, 64, 3]
    s2d = np.asarray(m.preprocess(img, 64, 64, s2d=True))  # [2, 32, 32, 12]
    assert s2d.shape == (2, 32, 32, 12)
    rebuilt = s2d.reshape(2, 32, 32, 2, 2, 3).transpose(
        0, 1, 3, 2, 4, 5).reshape(2, 64, 64, 3)
    np.testing.assert_array_equal(rebuilt, flat)
    # odd extents fall back to the flat layout
    odd = rng.randint(0, 256, (1, 45, 60, 3)).astype(np.uint8)
    assert np.asarray(m.preprocess(odd, 64, 64, s2d=True)).shape \
        == (1, 64, 64, 3)


def test_preprocess_i420_s2d_matches_unfused():
    """Fused I420->s2d preprocess == i420_to_bgr -> s2d -> normalize
    (the 2x2 s2d cell coincides with I420's chroma block, so the fused
    path never materializes full-res BGR — bit-identical values)."""
    from object_detection_tracking_tpu.config import DetectorConfig
    from object_detection_tracking_tpu.models import get_model
    cfg = DetectorConfig(num_class=4, resnet_depth=18, short_edge_size=48,
                         max_size=64, compute_dtype="float32")
    m = get_model(cfg)
    rng = np.random.RandomState(1)
    i420 = rng.randint(0, 256, (2, 66, 60)).astype(np.uint8)  # h=44
    fused = np.asarray(m.preprocess(i420, 64, 64, s2d=True))
    assert fused.shape == (2, 32, 32, 12)
    bgr = np.asarray(m.i420_to_bgr(i420))                  # [2, 44, 60, 3]
    unfused = np.asarray(m.preprocess(bgr, 64, 64, s2d=True))
    np.testing.assert_array_equal(fused, unfused)
