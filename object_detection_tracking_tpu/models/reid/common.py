"""Shared functional pieces for torch-named ReID models (NHWC)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

BN_EPS = 1e-5


def conv(p, name, x, stride=1, padding=0, groups=1):
    """torch-named conv: p[name + '.weight'] is HWIO (pre-transposed)."""
    w = p[name + ".weight"].astype(x.dtype)
    pad = ((padding, padding), (padding, padding)) if isinstance(padding, int) \
        else padding
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=x.dtype)
    if name + ".bias" in p:
        out = out + p[name + ".bias"].astype(x.dtype)
    return out


def bn(p, name, x, eps=BN_EPS):
    scale = p[name + ".weight"] / jnp.sqrt(p[name + ".running_var"] + eps)
    offset = p[name + ".bias"] - p[name + ".running_mean"] * scale
    return x * scale.astype(x.dtype) + offset.astype(x.dtype)


def linear(p, name, x):
    out = jnp.dot(x, p[name + ".weight"].astype(x.dtype))
    if name + ".bias" in p:
        out = out + p[name + ".bias"].astype(x.dtype)
    return out


def max_pool(x, window=3, stride=2, padding=1):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)))


def avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
        ((0, 0), (0, 0), (0, 0), (0, 0))) / 4.0


def global_avg_pool(x):
    return x.mean(axis=(1, 2))


def ceil_max_pool(x, window=3, stride=2):
    """torch MaxPool2d(ceil_mode=True, padding=0): pad only right/bottom
    as needed so the last partial window is kept."""
    import math
    h, w = x.shape[1], x.shape[2]
    pad_h = max(0, (math.ceil((h - window) / stride)) * stride + window - h)
    pad_w = max(0, (math.ceil((w - window) / stride)) * stride + window - w)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1),
        ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))


def avg_pool_excl(x, window=3, stride=1, padding=1):
    """torch AvgPool2d(count_include_pad=False): divide each window's sum
    by the number of non-padding elements it covers."""
    dims, strides = (1, window, window, 1), (1, stride, stride, 1)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pads)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, pads)
    return s / cnt
