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
