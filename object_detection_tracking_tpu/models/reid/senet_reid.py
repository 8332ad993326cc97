"""SENet-family ReID inference forwards (squeeze-and-excitation ResNets).

Architecture parity with the reference's vendored Cadene SENet
(torchreid/models/senet.py:91-245, configs :549-676): layer0 = 7x7/2 conv
+ BN + ReLU + ceil-mode 3x3/2 maxpool; bottlenecks carry an SE module
(GAP -> 1x1 fc1 -> ReLU -> 1x1 fc2 -> sigmoid gate) applied before the
residual add. Stride placement differs per variant (the Caffe quirk,
senet.py:175-182): se_resnet puts the stride on the 1x1 conv1, se_resnext
on the grouped 3x3 conv2. Params are flat torch-named dicts with HWIO
conv kernels (see extractor.load_torch_state_dict).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import bn, ceil_max_pool, conv, global_avg_pool, linear

LAYERS = {
    "se_resnet50": (3, 4, 6, 3),
    "se_resnet50_fc512": (3, 4, 6, 3),
    "se_resnet101": (3, 4, 23, 3),
    "se_resnet152": (3, 8, 36, 3),
    "se_resnext50_32x4d": (3, 4, 6, 3),
    "se_resnext101_32x4d": (3, 4, 23, 3),
}
LAST_STRIDE = {"se_resnet50_fc512": 1}


def _se_module(p, pre, x):
    s = x.mean(axis=(1, 2), keepdims=True)
    s = jax.nn.relu(conv(p, pre + ".fc1", s))
    s = jax.nn.sigmoid(conv(p, pre + ".fc2", s))
    return x * s


def _se_bottleneck(p, pre, x, stride: int, groups: int, resnext: bool):
    residual = x
    s1, s2 = (1, stride) if resnext else (stride, 1)
    out = jax.nn.relu(bn(p, pre + ".bn1", conv(p, pre + ".conv1", x,
                                               stride=s1)))
    out = jax.nn.relu(bn(p, pre + ".bn2",
                         conv(p, pre + ".conv2", out, stride=s2, padding=1,
                              groups=groups)))
    out = bn(p, pre + ".bn3", conv(p, pre + ".conv3", out))
    if pre + ".downsample.0.weight" in p:
        residual = bn(p, pre + ".downsample.1",
                      conv(p, pre + ".downsample.0", x, stride=stride))
    return jax.nn.relu(_se_module(p, pre + ".se_module", out) + residual)


def senet_reid_forward(p, images: jnp.ndarray,
                       variant: str = "se_resnet50") -> jnp.ndarray:
    """images: [B, 256, 128, 3] normalized RGB NHWC -> GAP features."""
    layers = LAYERS[variant]
    last_stride = LAST_STRIDE.get(variant, 2)
    resnext = "resnext" in variant
    groups = 32 if resnext else 1
    x = jax.nn.relu(bn(p, "layer0.bn1",
                       conv(p, "layer0.conv1", images, stride=2, padding=3)))
    x = ceil_max_pool(x)
    for li, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            stride = 1 if (li == 1 or b > 0) else (
                last_stride if li == 4 else 2)
            x = _se_bottleneck(p, f"layer{li}.{b}", x, stride, groups,
                               resnext)
    v = global_avg_pool(x)
    if "fc.0.weight" in p:  # fc_dims head: Linear + BN1d + ReLU
        v = jnp.maximum(bn(p, "fc.1", linear(p, "fc.0", v)), 0.0)
    return v.astype(jnp.float32)
