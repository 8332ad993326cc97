"""ResNet-family ReID inference forwards (torchvision-style blocks,
torchreid config: last_stride=2, no fc head — GAP features).

Covers resnet18/34 (BasicBlock), resnet50/101/152 (Bottleneck),
resnext50_32x4d / resnext101_32x8d (grouped 3x3), resnet50_fc512
(last_stride=1 + 512-d fc head).

Architecture parity with reference torchreid/models/resnet.py; params are a
flat torch-named dict with HWIO conv kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import jax.numpy as _jnp

from .common import bn, conv, global_avg_pool, linear, max_pool

LAYERS = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
          "resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
          "resnet152": (3, 8, 36, 3),
          "resnext50_32x4d": (3, 4, 6, 3), "resnext101_32x8d": (3, 4, 23, 3),
          "resnet50_fc512": (3, 4, 6, 3)}
# resnet50_fc512 keeps layer4 at stride 1 and adds a 512-d fc head
# (torchreid/models/resnet.py:517-527)
LAST_STRIDE = {"resnet50_fc512": 1}
# resnext variants use 32-group 3x3 convs (torchreid/models/resnet.py:476-506)
GROUPS = {"resnext50_32x4d": 32, "resnext101_32x8d": 32}


def _basic_block(p, pre, x, stride: int):
    """BasicBlock (torchreid/models/resnet.py:52-102): two 3x3 convs."""
    identity = x
    out = jax.nn.relu(bn(p, pre + ".bn1",
                         conv(p, pre + ".conv1", x, stride=stride,
                              padding=1)))
    out = bn(p, pre + ".bn2", conv(p, pre + ".conv2", out, padding=1))
    if pre + ".downsample.0.weight" in p:
        identity = bn(p, pre + ".downsample.1",
                      conv(p, pre + ".downsample.0", x, stride=stride))
    return jax.nn.relu(out + identity)


def _bottleneck(p, pre, x, stride: int, groups: int = 1):
    identity = x
    out = jax.nn.relu(bn(p, pre + ".bn1", conv(p, pre + ".conv1", x)))
    out = jax.nn.relu(bn(p, pre + ".bn2",
                         conv(p, pre + ".conv2", out, stride=stride,
                              padding=1, groups=groups)))
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
    groups = GROUPS.get(depth, 1)
    basic = "layer1.0.conv3.weight" not in p  # resnet18/34 use BasicBlock
    x = jax.nn.relu(bn(p, "bn1", conv(p, "conv1", images, stride=2,
                                      padding=3)))
    x = max_pool(x, 3, 2, 1)
    for li, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            stride = 1 if (li == 1 or b > 0) else (
                last_stride if li == 4 else 2)
            if basic:
                x = _basic_block(p, f"layer{li}.{b}", x, stride)
            else:
                x = _bottleneck(p, f"layer{li}.{b}", x, stride, groups)
    v = global_avg_pool(x)
    if "fc.0.weight" in p:   # fc_dims head: Linear + BN1d + ReLU
        v = _jnp.maximum(bn(p, "fc.1", linear(p, "fc.0", v)), 0.0)
    return v.astype(jnp.float32)
