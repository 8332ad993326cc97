"""MuDeep (multi-scale deep) ReID forward.

Architecture parity with torchreid/models/mudeep.py:31-199: fixed 256x128
input; conv stem, multi-scale inception block A, a reduction block,
multi-scale block B whose four streams are fused by learned per-channel
saliency weights + 4x4 avgpool, then a 4096-d fc (Linear + BN1d + ReLU)
over the channel-major-flattened [256,16,8] map. Params are flat
torch-named dicts with HWIO conv kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import bn, conv, linear, max_pool


def _cb(p, pre, x, stride=1, padding=0):
    return jax.nn.relu(bn(p, pre + ".bn", conv(p, pre + ".conv", x,
                                               stride=stride,
                                               padding=padding)))


def _avg_pool(x, window, stride, padding):
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    return s / float(window * window)


def mudeep_reid_forward(p, images: jnp.ndarray,
                        variant: str = "mudeep") -> jnp.ndarray:
    """images: [B, 256, 128, 3] normalized RGB NHWC -> [B, 4096]."""
    del variant
    if images.shape[1:3] != (256, 128):
        raise ValueError("mudeep requires 256x128 input crops "
                         f"(got {images.shape[1:3]})")
    # block1: conv stem (mudeep.py:31-44)
    x = _cb(p, "block1.conv1", images, padding=1)
    x = _cb(p, "block1.conv2", x, padding=1)
    x = max_pool(x, 3, 2, 1)
    # block2: MultiScaleA
    s1 = _cb(p, "block2.stream1.1", _cb(p, "block2.stream1.0", x),
             padding=1)
    s2 = _cb(p, "block2.stream2.1", _avg_pool(x, 3, 1, 1))
    s3 = _cb(p, "block2.stream3", x)
    s4 = _cb(p, "block2.stream4.2",
             _cb(p, "block2.stream4.1",
                 _cb(p, "block2.stream4.0", x), padding=1), padding=1)
    x = jnp.concatenate([s1, s2, s3, s4], axis=-1)
    # block3: Reduction
    r1 = max_pool(x, 3, 2, 1)
    r2 = _cb(p, "block3.stream2", x, stride=2, padding=1)
    r3 = _cb(p, "block3.stream3.2",
             _cb(p, "block3.stream3.1",
                 _cb(p, "block3.stream3.0", x), padding=1),
             stride=2, padding=1)
    x = jnp.concatenate([r1, r2, r3], axis=-1)
    # block4: MultiScaleB (asymmetric 1x3/3x1 convs)
    b1 = _cb(p, "block4.stream1.1", _avg_pool(x, 3, 1, 1))
    b2 = _cb(p, "block4.stream2.0", x)
    b2 = _cb(p, "block4.stream2.1", b2, padding=((0, 0), (1, 1)))
    b2 = _cb(p, "block4.stream2.2", b2, padding=((1, 1), (0, 0)))
    b3 = _cb(p, "block4.stream3", x)
    b4 = _cb(p, "block4.stream4.0", x)
    b4 = _cb(p, "block4.stream4.1", b4, padding=((0, 0), (1, 1)))
    b4 = _cb(p, "block4.stream4.2", b4, padding=((1, 1), (0, 0)))
    b4 = _cb(p, "block4.stream4.3", b4, padding=((0, 0), (1, 1)))
    b4 = _cb(p, "block4.stream4.4", b4, padding=((1, 1), (0, 0)))
    # block5: saliency fusion (a* stored [1,C,1,1], loader-transposed)
    fused = 0.0
    for name, s in (("a1", b1), ("a2", b2), ("a3", b3), ("a4", b4)):
        a = p[f"block5.{name}"].reshape(-1).astype(s.dtype)
        fused = fused + a * s
    x = _avg_pool(fused, 4, 4, 0)             # [B, 16, 8, 256]
    # torch flattens NCHW channel-major before the fc
    v = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
    v = jnp.maximum(bn(p, "fc.1", linear(p, "fc.0", v)), 0.0)
    return v.astype(jnp.float32)
