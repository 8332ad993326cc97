"""Deformable convolution v1 (Dai et al. 2017) — reference
deformable_helper.py + nn.py:1642-1712.

An offset branch predicts per-tap (dy, dx) displacements; the main conv
samples its 3x3 taps at the displaced positions bilinearly. With all-zero
offsets this is exactly a regular conv (the reference asserts the same),
which is what the unit test checks.

TPU note: the bilinear sampling is a data-dependent gather, so this path is
for parity with the reference's deformable variants, not a hot path (none
of the published v2-v6 zoo models enable it).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .layers import conv2d, init_conv


def init_deformable_conv(rng, c_in: int, c_out: int, kernel: int = 3) -> Dict:
    r1, r2 = jax.random.split(rng)
    return {
        "offset": init_conv(r1, kernel, c_in, 2 * kernel * kernel,
                            use_bias=True, w_init="normal", stddev=1e-8),
        "W": init_conv(r2, kernel, c_in, c_out, use_bias=False)["W"],
    }


def _bilinear_sample(x: jnp.ndarray, iy: jnp.ndarray,
                     ix: jnp.ndarray) -> jnp.ndarray:
    """x [H, W, C]; iy/ix [...]-shaped float coords (clamped, reference
    _tf_batch_map_coordinates clamps to the image). Returns [..., C]."""
    h, w, c = x.shape
    iy = jnp.clip(iy, 0.0, h - 1)
    ix = jnp.clip(ix, 0.0, w - 1)
    y0 = jnp.floor(iy).astype(jnp.int32)
    x0 = jnp.floor(ix).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (iy - y0)[..., None]
    fx = (ix - x0)[..., None]
    flat = x.reshape(h * w, c)

    def g(yy, xx):
        idx = (yy * w + xx).reshape(-1)
        return jnp.take(flat, idx, axis=0).reshape(yy.shape + (c,))

    top = g(y0, x0) * (1 - fx) + g(y0, x1) * fx
    bot = g(y1, x0) * (1 - fx) + g(y1, x1) * fx
    return top * (1 - fy) + bot * fy


def deformable_conv2d(params, x: jnp.ndarray, stride: int = 1,
                      kernel: int = 3) -> jnp.ndarray:
    """x [B, H, W, C] -> [B, H/stride, W/stride, C_out], SAME geometry."""
    b, h, w, c = x.shape
    pad = kernel // 2
    # offsets predicted at output resolution: [B, H', W', 2*k*k]
    offsets = conv2d(params["offset"], x, stride=stride,
                     padding=((pad, pad), (pad, pad)))
    ho, wo = offsets.shape[1:3]
    k2 = kernel * kernel
    offsets = offsets.reshape(b, ho, wo, k2, 2)

    oy = jnp.arange(ho) * stride
    ox = jnp.arange(wo) * stride
    ky, kx = jnp.meshgrid(jnp.arange(kernel) - pad,
                          jnp.arange(kernel) - pad, indexing="ij")
    ky = ky.reshape(-1)
    kx = kx.reshape(-1)
    # base tap coords [H', W', k2]
    base_y = oy[:, None, None] + ky[None, None, :]
    base_x = ox[None, :, None] + kx[None, None, :]
    iy = base_y[None] + offsets[..., 0]
    ix = base_x[None] + offsets[..., 1]

    sampled = jax.vmap(_bilinear_sample)(x, iy, ix)   # [B, H', W', k2, C]
    wmat = params["W"].reshape(k2 * c, -1)
    out = sampled.reshape(b, ho, wo, k2 * c) @ wmat.astype(x.dtype)
    return out
