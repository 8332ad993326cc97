"""MobileNetV2 ReID inference forward (torchreid/models/mobilenetv2.py).

Inverted-residual bottlenecks with ReLU6, torchreid's layer naming
(conv1, conv2..conv8 bottleneck stacks, conv9, optional fc). Params are a
flat torch-named dict with HWIO conv kernels (extractor.py conversion).
Covers mobilenetv2_x1_0 / mobilenetv2_x1_4 — widths are implied by the
checkpoint shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import bn, conv, global_avg_pool, linear

# (expansion t, repeats n, stride s) for conv2..conv8
# (mobilenetv2.py:95-118; output channels come from the weights)
_STAGES = ((1, 1, 1), (6, 2, 2), (6, 3, 2), (6, 4, 2),
           (6, 3, 1), (6, 3, 2), (6, 1, 1))


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _cb(p, pre, x, stride=1, padding=0, groups=1):
    """ConvBlock: conv (no bias) + bn + relu6 (mobilenetv2.py:18-42)."""
    return _relu6(bn(p, pre + ".bn",
                     conv(p, pre + ".conv", x, stride=stride,
                          padding=padding, groups=groups)))


def mobilenetv2_forward(p, images: jnp.ndarray) -> jnp.ndarray:
    """images: [B, 256, 128, 3] normalized RGB NHWC -> features
    [B, 1280*width] (or fc_dims[-1] when the ckpt has an fc head)."""
    x = _cb(p, "conv1", images, stride=2, padding=1)
    for ci, (t, n, s) in enumerate(_STAGES, start=2):
        for b in range(n):
            pre = f"conv{ci}.{b}"
            stride = s if b == 0 else 1
            inp = x
            m = _cb(p, pre + ".conv1", x)                    # 1x1 expand
            m = _cb(p, pre + ".dwconv2", m, stride=stride, padding=1,
                    groups=m.shape[-1])                      # 3x3 dw
            m = bn(p, pre + ".conv3.1",
                   conv(p, pre + ".conv3.0", m))             # linear proj
            x = inp + m if (stride == 1 and
                            inp.shape[-1] == m.shape[-1]) else m
    x = _cb(p, "conv9", x)
    v = global_avg_pool(x)
    if "fc.0.weight" in p:   # optional fc_dims head: Linear+BN1d+ReLU
        v = jnp.maximum(bn(p, "fc.1", linear(p, "fc.0", v)), 0.0)
    return v.astype(jnp.float32)
