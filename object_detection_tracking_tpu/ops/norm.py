"""Normalization layers (functional, NHWC).

Frozen BatchNorm matches the reference inference semantics exactly: stored
EMA statistics applied with eps=1e-5 (nn.py:1722-1792 — the reference always
runs inference with moving stats, and fine-tuning keeps them frozen too).
GroupNorm matches nn.py:81 (32 groups, eps=1e-5).
"""

from __future__ import annotations

import jax.numpy as jnp

BN_EPS = 1e-5
GN_EPS = 1e-5


def init_bn(c: int):
    return {
        "gamma": jnp.ones((c,), jnp.float32),
        "beta": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "variance": jnp.ones((c,), jnp.float32),
    }


def frozen_bn(params, x: jnp.ndarray) -> jnp.ndarray:
    """y = gamma * (x - mean) / sqrt(var + eps) + beta, channels-last.

    The affine is pre-folded into one scale/offset pair in f32 and applied in
    the input dtype — a single fused multiply-add that XLA merges into the
    producing conv."""
    scale = params["gamma"] / jnp.sqrt(params["variance"] + BN_EPS)
    offset = params["beta"] - params["mean"] * scale
    return x * scale.astype(x.dtype) + offset.astype(x.dtype)


def bn_relu(params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(frozen_bn(params, x), 0)


def init_gn(c: int, zero_gamma: bool = False):
    return {
        "gamma": (jnp.zeros if zero_gamma else jnp.ones)((c,), jnp.float32),
        "beta": jnp.zeros((c,), jnp.float32),
    }


def group_norm(params, x: jnp.ndarray, groups: int = 32) -> jnp.ndarray:
    """GroupNorm over NHWC input (nn.py:81-113)."""
    n, h, w, c = x.shape
    g = min(groups, c)
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32).reshape(n, h, w, g, c // g)
    mean = x32.mean(axis=(1, 2, 4), keepdims=True)
    var = x32.var(axis=(1, 2, 4), keepdims=True)
    x32 = (x32 - mean) / jnp.sqrt(var + GN_EPS)
    x32 = x32.reshape(n, h, w, c)
    return (x32 * params["gamma"] + params["beta"]).astype(orig_dtype)
