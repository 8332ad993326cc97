"""Fused stride-1 bottleneck-stack kernel vs the XLA resnet_group path
(interpret mode on CPU; the on-hardware A/B runs in tools/backbone_bench).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_detection_tracking_tpu.models.resnet import (init_bottleneck,
                                                         resnet_group)
from object_detection_tracking_tpu.ops.pallas.resnet_stage_pallas import (
    _pick_tr, fused_bottleneck_stage)


def _blocks(n, c_in, width, seed=0, jiggle_bn=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), n)
    blocks = {}
    c = c_in
    for i in range(n):
        blocks[f"block{i}"] = init_bottleneck(ks[i], c, width, False, False)
        c = width * 4
    if jiggle_bn:
        # non-trivial frozen-BN statistics so the scale/offset folding is
        # actually exercised (identity stats hide sign/offset bugs)
        key = [0]

        def walk(p):
            for k, v in p.items():
                if k == "bn":
                    key[0] += 1
                    r = jax.random.PRNGKey(key[0])
                    v["mean"] = jax.random.normal(r, v["mean"].shape) * 0.1
                    v["variance"] = jnp.abs(
                        jax.random.normal(r, v["variance"].shape)) + 0.5
                    v["gamma"] = 1 + 0.1 * jax.random.normal(
                        r, v["gamma"].shape)
                    v["beta"] = 0.05 * jax.random.normal(r, v["beta"].shape)
                elif isinstance(v, dict):
                    walk(v)
        walk(blocks)
    return blocks


def _run_both(blocks, n, x, width):
    ref = resnet_group(blocks, x, n, 1, 1, False, False, False)
    got = fused_bottleneck_stage(
        [blocks[f"block{i}"] for i in range(n)], x, width, width * 4)
    return np.asarray(ref, np.float32), np.asarray(got, np.float32)


@pytest.mark.parametrize("n_blocks", [1, 2, 3])
def test_matches_xla_group_f32(n_blocks):
    blocks = _blocks(n_blocks, 64, 16)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 24, 64),
                          jnp.float32)
    ref, got = _run_both(blocks, n_blocks, x, 16)
    np.testing.assert_allclose(got, ref, atol=2e-5 * max(
        1.0, float(np.abs(ref).max())))


def test_matches_xla_group_bf16():
    blocks = _blocks(3, 64, 16)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 24, 64),
                          jnp.bfloat16)
    ref, got = _run_both(blocks, 3, x, 16)
    # bf16 path: the kernel accumulates f32 (XLA path accumulates bf16),
    # so small relative differences are expected
    assert np.abs(got - ref).max() <= 0.02 * np.abs(ref).max()


def test_identity_shortcut_tail():
    # tail chunk without a convshortcut (c3/c4-style): c_in == 4*width
    blocks = _blocks(2, 64, 16)
    tail = {f"block{i}": blocks[f"block{i + 1}"] for i in range(1)}
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 16, 64),
                          jnp.float32)
    ref, got = _run_both(tail, 1, x, 16)
    np.testing.assert_allclose(got, ref, atol=2e-5 * max(
        1.0, float(np.abs(ref).max())))


def test_edge_rows_are_exact():
    """Halo masking: conv2 must see zeros beyond the image edge, not
    relu(conv1(0)+bias) — the top/bottom rows are where that shows."""
    blocks = _blocks(3, 64, 16)
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 12, 16, 64),
                          jnp.float32)
    ref, got = _run_both(blocks, 3, x, 16)
    d = np.abs(ref - got)
    tol = 2e-5 * max(1.0, float(np.abs(ref).max()))
    assert d[:, :3].max() <= tol and d[:, -3:].max() <= tol


def test_pick_tr_divides_and_budgets():
    tr = _pick_tr(184, 320, 64, 64, 256, 3)
    assert 184 % tr == 0 and tr >= 4
    # c5 at 720p: H=23 with 2048-ch tensors must NOT fit a useful tile
    assert _pick_tr(23, 40, 2048, 512, 2048, 2) < 4
