"""Inception-ResNet-v2 ReID forward.

Architecture parity with torchreid/models/inceptionresnetv2.py:37-340
(the Cadene pretrainedmodels graph): unpadded stem, Mixed_5b, 10x Block35
(scale .17), Mixed_6a, 20x Block17 (scale .10), Mixed_7a, 9x Block8
(scale .20) + final no-ReLU Block8, conv2d_7b, GAP -> 1536-d features.
BasicConv2d uses BN eps=1e-3 and no conv bias; the residual-scale 1x1
conv2d projections DO have biases; branch avg pool excludes padding from
the divisor. Params are flat torch-named dicts with HWIO conv kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import avg_pool_excl, bn, conv, global_avg_pool

_EPS = 1e-3
_P17H = ((0, 0), (3, 3))
_P17V = ((3, 3), (0, 0))
_P13H = ((0, 0), (1, 1))
_P13V = ((1, 1), (0, 0))


def _bc(p, pre, x, stride=1, padding=0):
    return jax.nn.relu(bn(p, pre + ".bn",
                          conv(p, pre + ".conv", x, stride=stride,
                               padding=padding), eps=_EPS))


def _maxpool_3_2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (0, 0), (0, 0), (0, 0)))


def _seq(p, pre, x, specs):
    for i, (stride, padding) in enumerate(specs):
        x = _bc(p, f"{pre}.{i}", x, stride=stride, padding=padding)
    return x


def _mixed_5b(p, pre, x):
    b0 = _bc(p, pre + ".branch0", x)
    b1 = _seq(p, pre + ".branch1", x, [(1, 0), (1, 2)])
    b2 = _seq(p, pre + ".branch2", x, [(1, 0), (1, 1), (1, 1)])
    b3 = _bc(p, pre + ".branch3.1", avg_pool_excl(x))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def _block35(p, pre, x, scale=0.17):
    b0 = _bc(p, pre + ".branch0", x)
    b1 = _seq(p, pre + ".branch1", x, [(1, 0), (1, 1)])
    b2 = _seq(p, pre + ".branch2", x, [(1, 0), (1, 1), (1, 1)])
    out = conv(p, pre + ".conv2d", jnp.concatenate([b0, b1, b2], axis=-1))
    return jax.nn.relu(out * scale + x)


def _mixed_6a(p, pre, x):
    b0 = _bc(p, pre + ".branch0", x, stride=2)
    b1 = _seq(p, pre + ".branch1", x, [(1, 0), (1, 1), (2, 0)])
    return jnp.concatenate([b0, b1, _maxpool_3_2(x)], axis=-1)


def _block17(p, pre, x, scale=0.10):
    b0 = _bc(p, pre + ".branch0", x)
    b1 = _seq(p, pre + ".branch1", x, [(1, 0), (1, _P17H), (1, _P17V)])
    out = conv(p, pre + ".conv2d", jnp.concatenate([b0, b1], axis=-1))
    return jax.nn.relu(out * scale + x)


def _mixed_7a(p, pre, x):
    b0 = _seq(p, pre + ".branch0", x, [(1, 0), (2, 0)])
    b1 = _seq(p, pre + ".branch1", x, [(1, 0), (2, 0)])
    b2 = _seq(p, pre + ".branch2", x, [(1, 0), (1, 1), (2, 0)])
    return jnp.concatenate([b0, b1, b2, _maxpool_3_2(x)], axis=-1)


def _block8(p, pre, x, scale=0.20, relu=True):
    b0 = _bc(p, pre + ".branch0", x)
    b1 = _seq(p, pre + ".branch1", x, [(1, 0), (1, _P13H), (1, _P13V)])
    out = conv(p, pre + ".conv2d", jnp.concatenate([b0, b1], axis=-1))
    out = out * scale + x
    return jax.nn.relu(out) if relu else out


def inceptionresnetv2_reid_forward(p, images: jnp.ndarray,
                                   variant: str = "inceptionresnetv2"
                                   ) -> jnp.ndarray:
    """images: [B, H, W, 3] normalized RGB NHWC -> [B, 1536] features."""
    del variant
    x = _bc(p, "conv2d_1a", images, stride=2)
    x = _bc(p, "conv2d_2a", x)
    x = _bc(p, "conv2d_2b", x, padding=1)
    x = _maxpool_3_2(x)
    x = _bc(p, "conv2d_3b", x)
    x = _bc(p, "conv2d_4a", x)
    x = _maxpool_3_2(x)
    x = _mixed_5b(p, "mixed_5b", x)
    for i in range(10):
        x = _block35(p, f"repeat.{i}", x)
    x = _mixed_6a(p, "mixed_6a", x)
    for i in range(20):
        x = _block17(p, f"repeat_1.{i}", x)
    x = _mixed_7a(p, "mixed_7a", x)
    for i in range(9):
        x = _block8(p, f"repeat_2.{i}", x)
    x = _block8(p, "block8", x, scale=1.0, relu=False)
    x = _bc(p, "conv2d_7b", x)
    return global_avg_pool(x).astype(jnp.float32)
