import numpy as np
import jax
import jax.numpy as jnp
import pytest

from object_detection_tracking_tpu.config import DetectorConfig
from object_detection_tracking_tpu.models.efficientdet import (
    EfficientDet, decode_effdet_boxes, effdet_anchors)
from object_detection_tracking_tpu.models.efficientdet.efficientnet import (
    round_filters, round_repeats, scaled_block_args)


def test_compound_scaling_matches_reference():
    # efficientnet_builder.py round_filters/round_repeats golden values
    assert round_filters(32, 1.0) == 32
    assert round_filters(32, 1.1) == 32   # b2 stem: 35.2 -> 32
    assert round_filters(320, 1.1) == 352
    assert round_repeats(2, 1.2) == 3
    args_b2 = scaled_block_args("efficientnet-b2")
    assert args_b2[1][5] == 3  # b2: 2 repeats * 1.2 -> 3


def test_anchor_field_golden():
    anchors = effdet_anchors((128, 128), min_level=3, max_level=7)
    assert len(anchors) == 5
    assert anchors[0].shape == (16, 16, 9, 4)
    # level 3, octave 0, aspect (1,1): size 4*8=32 centered at stride/2=4
    a0 = anchors[0][0, 0, 0]
    np.testing.assert_allclose(a0, [4 - 16, 4 - 16, 4 + 16, 4 + 16])
    # aspect (1.4, 0.7): half-extents 32*1.4/2, 32*0.7/2
    a1 = anchors[0][0, 0, 1]
    np.testing.assert_allclose(a1, [4 - 22.4, 4 - 11.2, 4 + 22.4, 4 + 11.2],
                               rtol=1e-6)


def test_decode_identity_and_shift():
    anchors = jnp.asarray([[10.0, 20.0, 50.0, 60.0]])
    dec = decode_effdet_boxes(jnp.zeros((1, 4)), anchors)
    np.testing.assert_allclose(np.asarray(dec), [[10, 20, 50, 60]], atol=1e-5)
    # ty shifts by anchor height: y += 40
    dec = decode_effdet_boxes(jnp.asarray([[1.0, 0, 0, 0]]), anchors)
    np.testing.assert_allclose(np.asarray(dec), [[10, 60, 50, 100]],
                               atol=1e-4)


@pytest.fixture(scope="module")
def tiny_effdet():
    cfg = DetectorConfig.coco(result_per_im=10, compute_dtype="float32",
                              efficientdet_name="efficientdet-test",
                              roi_align_impl="xla")
    m = EfficientDet(cfg, "efficientdet-test")
    params = m.init_params(jax.random.PRNGKey(0))
    return cfg, m, params


def test_effdet_forward_shapes(tiny_effdet):
    cfg, m, params = tiny_effdet
    imgs = np.random.RandomState(0).randint(
        0, 255, (1, 96, 128, 3)).astype(np.uint8)
    out = m.forward(params, imgs)
    assert out["final_boxes"].shape == (1, 10, 4)
    assert out["pooled_box_feat"].shape == (1, 10, 32)
    fb = np.asarray(out["final_boxes"])
    # boxes clipped to the true (pre-pad) image extent
    assert fb[..., 0::2].max() <= 128 and fb[..., 1::2].max() <= 96
    fl = np.asarray(out["final_labels"])
    fv = np.asarray(out["final_valid"])
    assert ((fl[fv] >= 1) & (fl[fv] <= 80)).all()


def _param_count(name):
    cfg = DetectorConfig.coco(result_per_im=10)
    m = EfficientDet(cfg, name)
    params = m.init_params(jax.random.PRNGKey(0))
    return sum(x.size for x in jax.tree.leaves(params))


@pytest.mark.parametrize("name,millions,tol", [
    # published EfficientDet param counts (automl README) — strong
    # whole-architecture checksums (ours differ slightly: 80-class heads
    # vs the paper's 90)
    ("efficientdet-d0", 3.9, 0.15),
    ("efficientdet-d1", 6.6, 0.25),
    ("efficientdet-d5", 33.7, 1.0),
    ("efficientdet-d6", 51.9, 1.6),
    ("efficientdet-d7", 51.9, 1.6),  # same graph as d6 (anchor/size differ)
])
def test_param_count_golden(name, millions, tol):
    n = _param_count(name)
    assert abs(n / 1e6 - millions) < tol, (name, n)


def test_partial_classes_gather(tiny_effdet):
    """Partial-class inference (reference efficientdet_wrapper.py:398-412):
    only the tracked classes' score columns survive, labels renumber into
    the partial taxonomy, and each kept detection's score matches the full
    model's score for that class."""
    cfg, m, params = tiny_effdet
    pcfg = DetectorConfig.coco_partial(
        result_per_im=10, compute_dtype="float32",
        efficientdet_name="efficientdet-test", roi_align_impl="xla")
    pm = EfficientDet(pcfg, "efficientdet-test")
    imgs = np.random.RandomState(1).randint(
        0, 255, (1, 96, 128, 3)).astype(np.uint8)
    full = m.forward(params, imgs)
    part = pm.forward(params, imgs)
    n_partial = len(pcfg.partial_classes)
    fl = np.asarray(part["final_labels"])[0]
    fv = np.asarray(part["final_valid"])[0]
    assert ((fl[fv] >= 1) & (fl[fv] <= n_partial)).all()
    # every partial detection's (box, score) exists in the full output
    # restricted to the partial class ids
    from object_detection_tracking_tpu.class_ids import coco_obj_class_to_id
    partial_coco_ids = {coco_obj_class_to_id[n]: i + 1
                        for i, n in enumerate(pcfg.partial_classes)}
    full_v = np.asarray(full["final_valid"])[0]
    full_pairs = {
        (round(float(p), 4), tuple(np.round(b, 2)))
        for b, l, p in zip(np.asarray(full["final_boxes"])[0][full_v],
                           np.asarray(full["final_labels"])[0][full_v],
                           np.asarray(full["final_probs"])[0][full_v])
        if int(l) in partial_coco_ids}
    part_pairs = {
        (round(float(p), 4), tuple(np.round(b, 2)))
        for b, p in zip(np.asarray(part["final_boxes"])[0][fv],
                        np.asarray(part["final_probs"])[0][fv])}
    # the partial model can keep MORE of these classes' boxes (no
    # competition from the other 77), so require full-side containment
    assert full_pairs <= part_pairs


def test_d6_d7_use_sum_fusion_and_d7_anchor_scale():
    cfg = DetectorConfig.coco(result_per_im=10)
    d6 = EfficientDet(cfg, "efficientdet-d6")
    assert d6.fusion == "sum" and d6.anchor_scale == 4.0
    d7 = EfficientDet(cfg, "efficientdet-d7")
    assert d7.fusion == "sum" and d7.anchor_scale == 5.0
    assert d7.image_size == 1536 and d7.backbone_name == "efficientnet-b6"
    # sum-fusion cells carry no wsm weights (ckpt-name parity with the
    # reference's bifpn_sum graphs)
    p = d6.init_params(jax.random.PRNGKey(0))
    assert "wsm" not in p["fpn_cells"]["cell_0"]["fnode0"]
