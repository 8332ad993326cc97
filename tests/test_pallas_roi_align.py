"""Pallas ROIAlign kernel vs the exact XLA path (interpret mode on CPU;
the real-hardware comparison runs in bench/verify on the TPU)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import object_detection_tracking_tpu.ops.pallas.roi_align_pallas as RP
from object_detection_tracking_tpu.ops.roi_align import multilevel_roi_align


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        RP.pl, "pallas_call",
        functools.partial(pl.pallas_call, interpret=True))
    yield


def run_both(feats, boxes, strides=(4, 8, 16, 32), pool=7):
    ref = jax.vmap(lambda f2, f3, f4, f5, bx: multilevel_roi_align(
        [f2, f3, f4, f5], bx, strides, pool))(
            feats[0], feats[1], feats[2], feats[3], boxes)
    got = RP.multilevel_roi_align_pallas(list(feats), boxes, strides, pool)
    return np.asarray(ref), np.asarray(got)


def make_feats(rng, b=1, c=16, h=64, w=96):
    return [jnp.asarray(rng.randn(b, h // (2 ** i), w // (2 ** i), c)
                        .astype(np.float32)) for i in range(4)]


def test_matches_xla_for_normal_boxes():
    rng = np.random.RandomState(0)
    feats = make_feats(rng)
    # aspect <= 2 boxes across all levels (image 256x384)
    n = 24
    s = np.exp(rng.uniform(np.log(16), np.log(200), n))
    ar = np.exp(rng.uniform(np.log(0.5), np.log(2.0), n))
    w = s * np.sqrt(ar)
    h = s / np.sqrt(ar)
    x0 = rng.uniform(0, 300, n)
    y0 = rng.uniform(0, 200, n)
    boxes = jnp.asarray(np.stack(
        [x0, y0, np.minimum(x0 + w, 384), np.minimum(y0 + h, 256)],
        -1)[None].astype(np.float32))
    ref, got = run_both(feats, boxes)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_batched_matches():
    rng = np.random.RandomState(1)
    feats = make_feats(rng, b=3)
    boxes = []
    for _ in range(3):
        x0 = rng.uniform(0, 200, 6)
        y0 = rng.uniform(0, 150, 6)
        sz = rng.uniform(20, 80, 6)
        boxes.append(np.stack([x0, y0, x0 + sz, y0 + sz], -1))
    boxes = jnp.asarray(np.stack(boxes).astype(np.float32))
    ref, got = run_both(feats, boxes)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_roi_count_not_multiple_of_blk():
    rng = np.random.RandomState(2)
    feats = make_feats(rng)
    x0 = rng.uniform(0, 200, 5)  # 5 % BLK != 0
    y0 = rng.uniform(0, 150, 5)
    sz = rng.uniform(20, 60, 5)
    boxes = jnp.asarray(
        np.stack([x0, y0, x0 + sz, y0 + sz], -1)[None].astype(np.float32))
    ref, got = run_both(feats, boxes)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_zero_area_and_edge_boxes_are_finite():
    rng = np.random.RandomState(3)
    feats = make_feats(rng)
    boxes = jnp.asarray(np.array([[
        [0, 0, 0, 0],               # degenerate
        [0, 0, 384, 256],           # whole image (overflows window: approx)
        [380, 250, 384, 256],       # bottom-right corner
    ]], np.float32))
    got = RP.multilevel_roi_align_pallas(
        list(feats), boxes, (4, 8, 16, 32), 7)
    assert np.isfinite(np.asarray(got)).all()


def test_trainable_vjp_matches_xla_grads():
    """Custom-VJP wrapper: Pallas forward + XLA backward must produce the
    same feature gradients as differentiating the pure XLA path."""
    rng = np.random.RandomState(4)
    feats = tuple(make_feats(rng, c=8))
    x0 = rng.uniform(0, 150, 5)
    y0 = rng.uniform(0, 100, 5)
    sz = rng.uniform(20, 60, 5)
    boxes = jnp.asarray(
        np.stack([x0, y0, x0 + sz, y0 + sz], -1)[None].astype(np.float32))

    def loss_pallas(fs):
        out = RP.multilevel_roi_align_trainable(fs, boxes, (4, 8, 16, 32), 7)
        return (out ** 2).sum()

    def loss_xla(fs):
        return (RP._xla_multilevel(list(fs), boxes, (4, 8, 16, 32), 7)
                ** 2).sum()

    g_p = jax.grad(loss_pallas)(feats)
    g_x = jax.grad(loss_xla)(feats)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
