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
        optimizer="momentum", init_lr=0.003, warmup_steps=0, total_steps=50,
        lr_schedule="constant", wd=0.0, clip_gradient_norm=10.0))
    state = trainer.init_state(params)
    step = trainer.step_fn()
    batch = make_batch()
    losses0 = None
    for i in range(4):
        state, losses = step(state, *batch, jax.random.PRNGKey(42))
        total = float(losses["total_loss"])
        assert np.isfinite(total)
        if losses0 is None:
            losses0 = total
    assert total < losses0, (losses0, total)
