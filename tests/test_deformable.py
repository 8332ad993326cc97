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


def test_offsets_change_output():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 10, 10, 4).astype(np.float32))
    p = init_deformable_conv(jax.random.PRNGKey(2), 4, 8)
    p["offset"]["b"] = jnp.ones_like(p["offset"]["b"]) * 0.5
    shifted = deformable_conv2d(p, x)
    p["offset"]["b"] = jnp.zeros_like(p["offset"]["b"])
    base = deformable_conv2d(p, x)
    assert np.abs(np.asarray(shifted) - np.asarray(base)).max() > 1e-3
