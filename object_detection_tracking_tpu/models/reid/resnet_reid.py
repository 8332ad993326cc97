"""ResNet-50/101 ReID inference forward (torchvision-style bottlenecks,
torchreid config: last_stride=2, no fc head — 2048-d GAP features).

Architecture parity with reference torchreid/models/resnet.py; params are a
flat torch-named dict with HWIO conv kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import bn, conv, global_avg_pool, max_pool

LAYERS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


def _bottleneck(p, pre, x, stride: int):
    identity = x
    out = jax.nn.relu(bn(p, pre + ".bn1", conv(p, pre + ".conv1", x)))
    out = jax.nn.relu(bn(p, pre + ".bn2",
                         conv(p, pre + ".conv2", out, stride=stride,
                              padding=1)))
    out = bn(p, pre + ".bn3", conv(p, pre + ".conv3", out))
    if pre + ".downsample.0.weight" in p:
        identity = bn(p, pre + ".downsample.1",
                      conv(p, pre + ".downsample.0", x, stride=stride))
    return jax.nn.relu(out + identity)


def resnet_reid_forward(p, images: jnp.ndarray,
                        depth: str = "resnet101") -> jnp.ndarray:
    """images: [B, 256, 128, 3] normalized RGB NHWC -> features [B, 2048]."""
    layers = LAYERS[depth]
    x = jax.nn.relu(bn(p, "bn1", conv(p, "conv1", images, stride=2,
                                      padding=3)))
    x = max_pool(x, 3, 2, 1)
    for li, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            stride = 2 if (b == 0 and li > 1) else 1
            x = _bottleneck(p, f"layer{li}.{b}", x, stride)
    return global_avg_pool(x).astype(jnp.float32)
