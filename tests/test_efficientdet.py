import numpy as np
import jax
import jax.numpy as jnp
import pytest

from object_detection_tracking_tpu.config import DetectorConfig
from object_detection_tracking_tpu.models import get_model
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


def test_lite_backbone_matches_reference_recipe():
    """efficientnet-lite (reference efficientnet_lite_builder.py:37-84):
    fix_head_stem (stem 32 unscaled, first/last group repeats unscaled),
    no SE, relu6; block filters still width-scale."""
    from object_detection_tracking_tpu.models.efficientdet.efficientnet import (  # noqa: E501
        efficientnet_c345, init_efficientnet)
    # lite4: width 1.4, depth 1.8 — b4 scales its stem to 48 and group0
    # repeats to 2; lite4 must keep 32 / 1
    p4 = init_efficientnet(jax.random.PRNGKey(0), "efficientnet-lite4")
    assert p4["stem"]["W"].shape[-1] == 32
    assert "block1" not in p4["group0"]          # repeats unscaled (1)
    assert "block1" in p4["group6"] or "block0" in p4["group6"]
    assert "block1" not in p4["group6"]          # last group unscaled (1)
    pb4 = init_efficientnet(jax.random.PRNGKey(0), "efficientnet-b4")
    assert pb4["stem"]["W"].shape[-1] == 48
    assert "block1" in pb4["group0"]             # b4: ceil(1.8*1) = 2
    # no SE anywhere in lite
    assert not any("se_reduce" in b for g in p4.values() if isinstance(g, dict)
                   for b in g.values() if isinstance(b, dict))
    assert "se_reduce" in pb4["group0"]["block0"]
    # forward: correct strides and width-scaled channels (lite2 w=1.1:
    # C5 = round_filters(320, 1.1) = 352)
    p2 = init_efficientnet(jax.random.PRNGKey(1), "efficientnet-lite2")
    x = jnp.asarray(np.random.RandomState(0).randn(1, 128, 128, 3),
                    jnp.float32)
    c3, c4, c5 = efficientnet_c345(p2, x, "efficientnet-lite2")
    assert c3.shape == (1, 16, 16, 48)
    assert c4.shape == (1, 8, 8, 120)
    assert c5.shape == (1, 4, 4, 352)


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


def test_effdet_encode_decode_roundtrip():
    from object_detection_tracking_tpu.models.efficientdet.anchors import (
        decode_effdet_boxes, encode_effdet_boxes)
    rng = np.random.RandomState(0)
    anchors = np.stack([
        rng.uniform(0, 50, 20), rng.uniform(0, 50, 20),
        rng.uniform(60, 120, 20), rng.uniform(60, 120, 20)], axis=1)
    boxes = np.stack([
        rng.uniform(0, 40, 20), rng.uniform(0, 40, 20),
        rng.uniform(50, 110, 20), rng.uniform(50, 110, 20)], axis=1)
    dec = decode_effdet_boxes(
        encode_effdet_boxes(jnp.asarray(boxes), jnp.asarray(anchors)),
        jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(dec), boxes, atol=1e-3)


def test_effdet_anchor_targets_rules():
    """AnchorLabeler semantics (ref efficientdet/anchors.py:540): positive
    at IOU>=0.5, no ignore band, and force-match gives every valid gt its
    best anchor even below threshold."""
    from object_detection_tracking_tpu.train.targets import (
        effdet_anchor_targets)
    anchors = jnp.asarray(np.array([
        [0, 0, 10, 10],       # IOU 1.0 with gt0 -> fg
        [100, 100, 110, 110],  # best anchor for gt1 (low IOU) -> forced fg
        [200, 200, 210, 210],  # no overlap -> bg
    ], np.float32))
    gt = jnp.asarray(np.array([[0, 0, 10, 10], [100, 100, 140, 160],
                               [0, 0, 0, 0]], np.float32))
    gl = jnp.asarray(np.array([2, 3, 1], np.int32))
    gv = jnp.asarray([True, True, False])
    cls_t, box_t, fg = effdet_anchor_targets(anchors, gt, gl, gv)
    assert np.asarray(fg).tolist() == [True, True, False]
    assert np.asarray(cls_t).tolist() == [2, 3, 0]
    # exact-match anchor encodes to zero deltas
    np.testing.assert_allclose(np.asarray(box_t)[0], 0.0, atol=1e-5)
    # padded gt row never matches
    assert np.asarray(cls_t)[2] == 0


def test_effdet_train_step_converges():
    """forward_train through the shared Trainer on the tiny variant: the
    loss must drop hard on a fixed two-image batch (proves focal+huber
    wiring and gradients flow through BiFPN/heads)."""
    from object_detection_tracking_tpu.train import Trainer
    from object_detection_tracking_tpu.config import TrainConfig
    cfg = DetectorConfig(
        model="efficientdet", efficientdet_name="efficientdet-test",
        num_class=4, compute_dtype="float32", result_per_im=8,
        is_train=True)
    model = get_model(cfg)
    assert type(model).__name__ == "EfficientDet"  # factory routes by cfg
    params = model.init_params(jax.random.PRNGKey(0))
    tr = Trainer(model, TrainConfig(
        optimizer="adam", init_lr=3e-3, warmup_steps=0, total_steps=100,
        lr_schedule="constant", wd=0.0, clip_gradient_norm=10.0))
    state = tr.init_state(params)
    step = tr.step_fn()
    imgs = np.zeros((2, 128, 128, 3), np.uint8)
    imgs[0, 20:60, 30:80] = 255
    imgs[1, 60:110, 10:50] = 180
    gtb = np.asarray([[[30, 20, 80, 60], [0, 0, 0, 0]],
                      [[10, 60, 50, 110], [0, 0, 0, 0]]], np.float32)
    gtl = np.asarray([[1, 0], [2, 0]], np.int32)
    gtv = np.asarray([[True, False], [True, False]])
    totals = []
    for i in range(25):
        state, losses = step(state, imgs, gtb, gtl, gtv,
                             jax.random.PRNGKey(i))
        t = float(losses["total_loss"])
        assert np.isfinite(t)
        totals.append(t)
    assert np.mean(totals[-3:]) < 0.5 * totals[0], totals

    # precise-BN calibration (training runs batch-stat BN; inference
    # needs population stats): stats must move off the 0/1 init, every
    # BN site must be written, and the calibrated forward must be finite
    trained = jax.device_get(state["params"])
    bn_means_before = [np.asarray(p["bn"]["mean"]).copy()
                       for p in (trained["backbone"]["stem"],)]
    model.calibrate_bn(trained, iter([imgs, imgs]))
    stem_bn = trained["backbone"]["stem"]["bn"]
    assert np.abs(np.asarray(stem_bn["mean"]) - bn_means_before[0]).max() \
        > 1e-6, "calibration did not write stem stats"
    assert np.asarray(trained["class_net"]["bn0_l3"]["variance"]).std() \
        > 0, "head BN variance still at init"
    out = model.forward(trained, imgs)
    assert np.isfinite(np.asarray(out["final_probs"])).all()
    # with batch-BN training + calibrated stats the tiny overfit model
    # must actually fire on its training images
    assert np.asarray(out["final_valid"]).any()
