"""ResNet-50/101 ReID inference forward (torchvision-style bottlenecks,
torchreid config: last_stride=2, no fc head — 2048-d GAP features).

Architecture parity with reference torchreid/models/resnet.py; params are a
flat torch-named dict with HWIO conv kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import jax.numpy as _jnp

from .common import bn, conv, global_avg_pool, linear, max_pool

LAYERS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
          "resnet50_fc512": (3, 4, 6, 3)}
# resnet50_fc512 keeps layer4 at stride 1 and adds a 512-d fc head
# (torchreid/models/resnet.py:517-527)
LAST_STRIDE = {"resnet50_fc512": 1}


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
    last_stride = LAST_STRIDE.get(depth, 2)
    x = jax.nn.relu(bn(p, "bn1", conv(p, "conv1", images, stride=2,
                                      padding=3)))
    x = max_pool(x, 3, 2, 1)
    for li, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            stride = 1 if (li == 1 or b > 0) else (
                last_stride if li == 4 else 2)
            x = _bottleneck(p, f"layer{li}.{b}", x, stride)
    v = global_avg_pool(x)
    if "fc.0.weight" in p:   # fc_dims head: Linear + BN1d + ReLU
        v = _jnp.maximum(bn(p, "fc.1", linear(p, "fc.0", v)), 0.0)
    return v.astype(jnp.float32)
