"""Inception-v4 ReID forward.

Architecture parity with torchreid/models/inceptionv4.py:37-363 (the
Cadene pretrainedmodels graph): unpadded stem convs, Mixed_3a/4a/5a stem
joins, 4x Inception-A, Reduction-A, 7x Inception-B, Reduction-B,
3x Inception-C, GAP -> 1536-d features. BasicConv2d uses BN eps=1e-3 and
no conv bias; branch avg pools exclude padding from the divisor. Params
are flat torch-named dicts with HWIO conv kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import avg_pool_excl, bn, conv, global_avg_pool

_EPS = 1e-3


def _bc(p, pre, x, stride=1, padding=0):
    return jax.nn.relu(bn(p, pre + ".bn",
                          conv(p, pre + ".conv", x, stride=stride,
                               padding=padding), eps=_EPS))


def _maxpool_3_2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (0, 0), (0, 0), (0, 0)))


def _seq(p, pre, x, specs):
    """Run a Sequential of BasicConv2d given (stride, padding) per step."""
    for i, (stride, padding) in enumerate(specs):
        x = _bc(p, f"{pre}.{i}", x, stride=stride, padding=padding)
    return x


_P17H = ((0, 0), (3, 3))   # (1,7) kernel padding (0,3)
_P17V = ((3, 3), (0, 0))   # (7,1) kernel padding (3,0)
_P13H = ((0, 0), (1, 1))
_P13V = ((1, 1), (0, 0))


def _inception_a(p, pre, x):
    b0 = _bc(p, pre + ".branch0", x)
    b1 = _seq(p, pre + ".branch1", x, [(1, 0), (1, 1)])
    b2 = _seq(p, pre + ".branch2", x, [(1, 0), (1, 1), (1, 1)])
    b3 = _bc(p, pre + ".branch3.1", avg_pool_excl(x))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def _reduction_a(p, pre, x):
    b0 = _bc(p, pre + ".branch0", x, stride=2)
    b1 = _seq(p, pre + ".branch1", x, [(1, 0), (1, 1), (2, 0)])
    return jnp.concatenate([b0, b1, _maxpool_3_2(x)], axis=-1)


def _inception_b(p, pre, x):
    b0 = _bc(p, pre + ".branch0", x)
    b1 = _seq(p, pre + ".branch1", x, [(1, 0), (1, _P17H), (1, _P17V)])
    b2 = _seq(p, pre + ".branch2", x,
              [(1, 0), (1, _P17V), (1, _P17H), (1, _P17V), (1, _P17H)])
    b3 = _bc(p, pre + ".branch3.1", avg_pool_excl(x))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def _reduction_b(p, pre, x):
    b0 = _seq(p, pre + ".branch0", x, [(1, 0), (2, 0)])
    b1 = _seq(p, pre + ".branch1", x,
              [(1, 0), (1, _P17H), (1, _P17V), (2, 0)])
    return jnp.concatenate([b0, b1, _maxpool_3_2(x)], axis=-1)


def _inception_c(p, pre, x):
    b0 = _bc(p, pre + ".branch0", x)
    b1_0 = _bc(p, pre + ".branch1_0", x)
    b1 = jnp.concatenate([_bc(p, pre + ".branch1_1a", b1_0, padding=_P13H),
                          _bc(p, pre + ".branch1_1b", b1_0, padding=_P13V)],
                         axis=-1)
    b2 = _bc(p, pre + ".branch2_0", x)
    b2 = _bc(p, pre + ".branch2_1", b2, padding=_P13V)
    b2 = _bc(p, pre + ".branch2_2", b2, padding=_P13H)
    b2 = jnp.concatenate([_bc(p, pre + ".branch2_3a", b2, padding=_P13H),
                          _bc(p, pre + ".branch2_3b", b2, padding=_P13V)],
                         axis=-1)
    b3 = _bc(p, pre + ".branch3.1", avg_pool_excl(x))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def inceptionv4_reid_forward(p, images: jnp.ndarray,
                             variant: str = "inceptionv4") -> jnp.ndarray:
    """images: [B, H, W, 3] normalized RGB NHWC -> [B, 1536] features."""
    del variant
    f = "features"
    x = _bc(p, f + ".0", images, stride=2)
    x = _bc(p, f + ".1", x)
    x = _bc(p, f + ".2", x, padding=1)
    # Mixed_3a
    x = jnp.concatenate([_maxpool_3_2(x), _bc(p, f + ".3.conv", x,
                                              stride=2)], axis=-1)
    # Mixed_4a
    b0 = _seq(p, f + ".4.branch0", x, [(1, 0), (1, 0)])
    b1 = _seq(p, f + ".4.branch1", x,
              [(1, 0), (1, _P17H), (1, _P17V), (1, 0)])
    x = jnp.concatenate([b0, b1], axis=-1)
    # Mixed_5a
    x = jnp.concatenate([_bc(p, f + ".5.conv", x, stride=2),
                         _maxpool_3_2(x)], axis=-1)
    for i in range(6, 10):
        x = _inception_a(p, f + f".{i}", x)
    x = _reduction_a(p, f + ".10", x)
    for i in range(11, 18):
        x = _inception_b(p, f + f".{i}", x)
    x = _reduction_b(p, f + ".18", x)
    for i in range(19, 22):
        x = _inception_c(p, f + f".{i}", x)
    return global_avg_pool(x).astype(jnp.float32)
