import numpy as np
import jax
import jax.numpy as jnp

from object_detection_tracking_tpu.models.deformable import (
    deformable_conv2d, init_deformable_conv)
from object_detection_tracking_tpu.models.layers import conv2d


def test_zero_offset_equals_regular_conv():
    """With zero offsets the deformable conv must match a plain SAME conv —
    the reference's own sanity check (nn.py:486-490 comment)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 12, 8).astype(np.float32))
    p = init_deformable_conv(jax.random.PRNGKey(0), 8, 16)
    p["offset"]["W"] = jnp.zeros_like(p["offset"]["W"])
    p["offset"]["b"] = jnp.zeros_like(p["offset"]["b"])
    got = deformable_conv2d(p, x, stride=1)
    want = conv2d({"W": p["W"]}, x, stride=1, padding=((1, 1), (1, 1)))
    # borders differ by design: the sampler clamps (border-replicate) while
    # a plain conv zero-pads — same as the reference sampler
    np.testing.assert_allclose(np.asarray(got)[:, 1:-1, 1:-1],
                               np.asarray(want)[:, 1:-1, 1:-1], atol=2e-4)


def test_zero_offset_stride2():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 12, 16, 4).astype(np.float32))
    p = init_deformable_conv(jax.random.PRNGKey(1), 4, 8)
    p["offset"]["W"] = jnp.zeros_like(p["offset"]["W"])
    p["offset"]["b"] = jnp.zeros_like(p["offset"]["b"])
    got = deformable_conv2d(p, x, stride=2)
    want = conv2d({"W": p["W"]}, x, stride=2, padding=((1, 1), (1, 1)))
    assert got.shape == want.shape == (1, 6, 8, 8)
    np.testing.assert_allclose(np.asarray(got)[:, 1:-1, 1:-1],
                               np.asarray(want)[:, 1:-1, 1:-1], atol=2e-4)


def _np_batch_map_offsets(inputs, offsets, grid_offset):
    """Numpy port of the reference bilinear offset sampler
    (deformable_helper.py:42-137 _tf_batch_map_coordinates /
    _tf_batch_map_offsets): coords = grid + offsets, clipped to the map,
    sampled with floor/ceil corners and two-stage lerp (y then x).

    inputs [b, h, w, c]; offsets [b, h, w, 2n]; grid_offset [h, w, n, 2]
    -> [b, h, w, n, c]."""
    b, h, w, c = inputs.shape
    n = offsets.shape[-1] // 2
    coords = grid_offset[None] + offsets.reshape(b, h, w, n, 2)
    cy = np.clip(coords[..., 0], 0.0, h - 1)
    cx = np.clip(coords[..., 1], 0.0, w - 1)
    y_lt = np.floor(cy).astype(np.int64)
    x_lt = np.floor(cx).astype(np.int64)
    y_rb = np.ceil(cy).astype(np.int64)
    x_rb = np.ceil(cx).astype(np.int64)
    bidx = np.arange(b)[:, None, None, None]
    v_lt = inputs[bidx, y_lt, x_lt]        # [b, h, w, n, c]
    v_rb = inputs[bidx, y_rb, x_rb]
    v_lb = inputs[bidx, y_lt, x_rb]        # lb = (floor y, ceil x)
    v_rt = inputs[bidx, y_rb, x_lt]        # rt = (ceil y, floor x)
    fy = (cy - y_lt)[..., None]
    fx = (cx - x_lt)[..., None]
    # reference: vals_t lerps along dim0 (y) between lt and rt, vals_b
    # between lb and rb, then lerp along dim1 (x)
    v_t = v_lt + (v_rt - v_lt) * fy
    v_b = v_lb + (v_rb - v_lb) * fy
    return v_t + (v_b - v_t) * fx


def test_random_offset_parity_vs_reference_sampler():
    """Golden parity on NONZERO offsets (VERDICT r4 #6): the full
    deformable conv must equal the reference pipeline — offset conv ->
    _tf_batch_map_offsets bilinear sampling -> tap-major contraction with
    W (the conv3d trick, nn.py:1696-1703) — ported to numpy.

    Grid note: the grid here is base + ROW-MAJOR 3x3 taps. The
    reference's own initial_offset construction (nn.py:1661-1667)
    reshapes the stacked [2,3,3] meshgrid to [9,2], which interleaves
    the y/x planes and yields only 6 unique taps (3 duplicated) — a
    latent upstream bug that breaks its own zero-offset==conv sanity
    comment (nn.py:477-479). We implement the evidently *intended*
    row-major grid, under which zero-offset==regular-conv holds (tested
    above)."""
    rng = np.random.RandomState(7)
    b, h, w, c, co, k = 2, 9, 11, 5, 6, 3
    x = rng.randn(b, h, w, c).astype(np.float32)
    p = init_deformable_conv(jax.random.PRNGKey(3), c, co, kernel=k)
    # real, non-trivial offsets: random offset-conv weights at +-1px scale
    p["offset"]["W"] = jnp.asarray(
        rng.randn(*p["offset"]["W"].shape).astype(np.float32) * 0.05)
    p["offset"]["b"] = jnp.asarray(
        rng.randn(2 * k * k).astype(np.float32) * 0.3)

    for stride in (1, 2):
        got = np.asarray(deformable_conv2d(p, jnp.asarray(x),
                                           stride=stride))
        # numpy reference path. The reference predicts offsets at input
        # resolution with a stride-1 SAME conv and lets the stride-2
        # conv3d subsample them (nn.py:474-478 + 1699); offsets at the
        # surviving (even) positions are identical to our stride-2
        # offset conv, so sample at full resolution and subsample.
        offsets = np.asarray(conv2d(p["offset"], jnp.asarray(x), stride=1,
                                    padding=((1, 1), (1, 1))))
        base = np.stack(np.meshgrid(np.arange(h), np.arange(w),
                                    indexing="ij"), -1).astype(np.float32)
        taps = np.stack(np.meshgrid(np.arange(k) - 1, np.arange(k) - 1,
                                    indexing="ij"), -1).reshape(-1, 2)
        grid = base[:, :, None, :] + taps[None, None].astype(np.float32)
        sampled = _np_batch_map_offsets(x, offsets, grid)  # [b,h,w,k2,c]
        wmat = np.asarray(p["W"]).reshape(k * k * c, co)
        want = sampled.reshape(b, h, w, -1) @ wmat
        want = want[:, ::stride, ::stride]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=3e-4)


def test_offsets_receive_gradients_and_train():
    """The offset branch must be trainable end-to-end (VERDICT r4 #6):
    nonzero grads through the bilinear sampler, and a short optimization
    moves the offset weights while the loss drops."""
    import optax
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    target = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))
    p = init_deformable_conv(jax.random.PRNGKey(5), 4, 6)
    # start from a visibly nonzero offset field so the sampler sits in
    # the bilinear (non-degenerate) regime
    p["offset"]["b"] = jnp.full_like(p["offset"]["b"], 0.25)

    def loss_fn(params):
        out = deformable_conv2d(params, x)
        return jnp.mean((out - target) ** 2)

    g = jax.grad(loss_fn)(p)
    assert float(jnp.abs(g["offset"]["W"]).max()) > 0
    assert float(jnp.abs(g["offset"]["b"]).max()) > 0

    tx = optax.adam(1e-2)
    opt_state = tx.init(p)
    l0 = float(loss_fn(p))
    p0_off = np.asarray(p["offset"]["W"]).copy()

    @jax.jit
    def step(params, state):
        l, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = tx.update(grads, state)
        return optax.apply_updates(params, updates), state, l

    for _ in range(200):
        p, opt_state, l = step(p, opt_state)
    assert float(l) < 0.5 * l0, (float(l), l0)
    assert np.abs(np.asarray(p["offset"]["W"]) - p0_off).max() > 1e-4


def test_offsets_change_output():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 10, 10, 4).astype(np.float32))
    p = init_deformable_conv(jax.random.PRNGKey(2), 4, 8)
    p["offset"]["b"] = jnp.ones_like(p["offset"]["b"]) * 0.5
    shifted = deformable_conv2d(p, x)
    p["offset"]["b"] = jnp.zeros_like(p["offset"]["b"])
    base = deformable_conv2d(p, x)
    assert np.abs(np.asarray(shifted) - np.asarray(base)).max() > 1e-3
