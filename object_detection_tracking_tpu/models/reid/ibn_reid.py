"""IBN-Net ReID forwards: resnet50_ibn_a / resnet50_ibn_b.

Architecture parity with the reference's vendored IBN-Nets
(torchreid/models/resnet_ibn_a.py:63-101, resnet_ibn_b.py:62-112):

- ibn_a: bottleneck bn1 is replaced by IBN — instance norm (affine) on the
  first half of the channels, batch norm on the rest — in layers 1-3.
- ibn_b: the stem BN is an instance norm, and the LAST block of layers 1-2
  applies an instance norm after the residual add, before the final ReLU.

Which blocks carry IN is detected from the checkpoint names (``...bn1.IN.*``
/ ``...IN.*``) rather than hardcoded, so the forward follows any compatible
state_dict. Params are flat torch-named dicts with HWIO conv kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import bn, conv, global_avg_pool, linear, max_pool

IN_EPS = 1e-5  # torch InstanceNorm2d default


def _instance_norm(p, name, x):
    """Affine InstanceNorm2d (no running stats: eval == train statistics)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = ((x - mean) ** 2).mean(axis=(1, 2), keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + jnp.asarray(IN_EPS, x.dtype))
    return xn * p[name + ".weight"].astype(x.dtype) + \
        p[name + ".bias"].astype(x.dtype)


def _ibn(p, pre, x):
    """IBN layer (resnet_ibn_a.py:63-78): IN on channels [:half], BN on
    the rest, concatenated."""
    half = p[pre + ".IN.weight"].shape[0]
    a = _instance_norm(p, pre + ".IN", x[..., :half])
    b_ = bn(p, pre + ".BN", x[..., half:])
    return jnp.concatenate([a, b_], axis=-1)


def _bottleneck(p, pre, x, stride: int):
    residual = x
    out = conv(p, pre + ".conv1", x)
    if pre + ".bn1.IN.weight" in p:  # ibn_a block
        out = _ibn(p, pre + ".bn1", out)
    else:
        out = bn(p, pre + ".bn1", out)
    out = jax.nn.relu(out)
    out = jax.nn.relu(bn(p, pre + ".bn2",
                         conv(p, pre + ".conv2", out, stride=stride,
                              padding=1)))
    out = bn(p, pre + ".bn3", conv(p, pre + ".conv3", out))
    if pre + ".downsample.0.weight" in p:
        residual = bn(p, pre + ".downsample.1",
                      conv(p, pre + ".downsample.0", x, stride=stride))
    out = out + residual
    if pre + ".IN.weight" in p:  # ibn_b: IN after the residual add
        out = _instance_norm(p, pre + ".IN", out)
    return jax.nn.relu(out)


def ibn_reid_forward(p, images: jnp.ndarray,
                     variant: str = "resnet50_ibn_a") -> jnp.ndarray:
    """images: [B, H, W, 3] normalized RGB NHWC -> [B, 2048] GAP features."""
    del variant  # both variants are fully determined by the param names
    x = conv(p, "conv1", images, stride=2, padding=3)
    if "bn1.running_mean" in p:
        x = bn(p, "bn1", x)
    else:  # ibn_b stem instance norm (resnet_ibn_b.py:142)
        x = _instance_norm(p, "bn1", x)
    x = max_pool(jax.nn.relu(x), 3, 2, 1)
    for li, n_blocks in enumerate((3, 4, 6, 3), start=1):
        for b in range(n_blocks):
            stride = 2 if (li > 1 and b == 0) else 1
            x = _bottleneck(p, f"layer{li}.{b}", x, stride)
    v = global_avg_pool(x)
    if "fc.0.weight" in p:
        v = jnp.maximum(bn(p, "fc.1", linear(p, "fc.0", v)), 0.0)
    return v.astype(jnp.float32)
