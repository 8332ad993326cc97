"""EfficientDet checkpoint name-mapping tests.

No real automl checkpoint exists in this image (zero egress), so the map
is validated three ways: hand-transcribed variable names from the automl
source conventions must be present verbatim; the map must cover EVERY
model parameter leaf (nothing silently left random); and a synthetic
checkpoint round-trips with the dw-kernel layout fix and WSM scalar
gathering applied.
"""

import numpy as np
import jax
import pytest

from object_detection_tracking_tpu.config import DetectorConfig
from object_detection_tracking_tpu.models.efficientdet import EfficientDet
from object_detection_tracking_tpu.utils.effdet_weights import (
    effdet_name_map, load_effdet_reference)


@pytest.fixture(scope="module")
def d0():
    cfg = DetectorConfig.coco(result_per_im=10)
    return EfficientDet(cfg, "efficientdet-d0")


def test_known_automl_names_present(d0):
    """Names transcribed from the automl source (efficientnet_model.py
    variable creation order; efficientdet_arch.py scopes) — a wrong name
    generator fails here, independent of the loader."""
    m = effdet_name_map(d0)
    expected = [
        "efficientnet-b0/stem/conv2d/kernel",
        "efficientnet-b0/stem/tpu_batch_normalization/moving_mean",
        # blocks_0: expand_ratio 1 -> no expand conv; project is conv2d
        "efficientnet-b0/blocks_0/depthwise_conv2d/depthwise_kernel",
        "efficientnet-b0/blocks_0/conv2d/kernel",
        "efficientnet-b0/blocks_0/tpu_batch_normalization_1/gamma",
        "efficientnet-b0/blocks_0/se/conv2d/bias",
        # blocks_1: expand_ratio 6 -> expand conv2d, project conv2d_1
        "efficientnet-b0/blocks_1/conv2d/kernel",
        "efficientnet-b0/blocks_1/conv2d_1/kernel",
        "efficientnet-b0/blocks_1/tpu_batch_normalization_2/beta",
        # b0 has 16 blocks total
        "efficientnet-b0/blocks_15/conv2d_1/kernel",
        "resample_p6/conv2d/kernel",
        "resample_p6/bn/moving_variance",
        # fnode0 (inputs P6, P7): P6 is id 3 -> no resample conv; WSM pair
        "fpn_cells/cell_0/fnode0/WSM",
        "fpn_cells/cell_0/fnode0/WSM_1",
        "fpn_cells/cell_0/fnode0/op_after_combine5/conv/depthwise_kernel",
        "fpn_cells/cell_0/fnode0/op_after_combine5/conv/pointwise_kernel",
        "fpn_cells/cell_0/fnode0/op_after_combine5/bn/gamma",
        # fnode1 (inputs 2, 5): raw P5 (offset 2, idx 0) gets a 1x1
        "fpn_cells/cell_0/fnode1/resample_0_2_6/conv2d/kernel",
        "fpn_cells/cell_0/fnode1/resample_0_2_6/bn/moving_mean",
        # fnode4 (inputs 1, 7, 8): raw P4 at idx 0, 3 WSM edges
        "fpn_cells/cell_0/fnode4/resample_0_1_9/conv2d/kernel",
        "fpn_cells/cell_0/fnode4/WSM_2",
        # later cells have no resample convs
        "fpn_cells/cell_2/fnode7/op_after_combine12/conv/bias",
        "class_net/class-0/depthwise_kernel",
        "class_net/class-1-bn-5/moving_mean",
        "class_net/class-predict/pointwise_kernel",
        "box_net/box-2/bias",
        "box_net/box-predict/bias",
    ]
    for name in expected:
        assert name in m, name
    assert "fpn_cells/cell_1/fnode1/resample_0_2_6/conv2d/kernel" not in m
    # blocks_16 must not exist for b0
    assert not any(k.startswith("efficientnet-b0/blocks_16") for k in m)


def test_map_covers_every_param_leaf(d0):
    """Bidirectional coverage: every pytree leaf is the target of >=1 map
    entry, and every map target exists in the pytree."""
    params = d0.init_params(jax.random.PRNGKey(0))
    leaf_paths = set()

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, prefix + (k,))
        else:
            leaf_paths.add(prefix)

    rec(params, ())
    m = effdet_name_map(d0)
    targets = {path for path, _ in m.values()}
    missing = leaf_paths - targets
    assert not missing, sorted(missing)[:10]
    dangling = targets - leaf_paths
    assert not dangling, sorted(dangling)[:10]


def test_roundtrip_with_layout_fixes():
    cfg = DetectorConfig.coco(result_per_im=10, compute_dtype="float32",
                              efficientdet_name="efficientdet-test",
                              roi_align_impl="xla")
    model = EfficientDet(cfg, "efficientdet-test")
    src = jax.tree.map(np.asarray,
                       model.init_params(jax.random.PRNGKey(3)))
    m = effdet_name_map(model)

    def get(path):
        node = src
        for k in path:
            node = node[k]
        return np.asarray(node)

    weights = {}
    for name, (path, kind) in m.items():
        v = get(path)
        if kind == "dw":
            v = v.transpose(0, 1, 3, 2)   # ours [H,W,1,C] -> TF [H,W,C,1]
        if isinstance(kind, tuple) and kind[0] == "wsm":
            v = np.float32(v[kind[1]])
        weights[name + ":0"] = v
    weights["global_step:0"] = np.array(7, np.int64)

    loaded = jax.tree.map(np.asarray, load_effdet_reference(weights, model))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(src),
            jax.tree_util.tree_leaves_with_path(loaded)):
        assert ka == kb
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=str(ka))
