"""PCB (Part-based Convolutional Baseline) ReID forwards: pcb_p6 / pcb_p4.

Architecture parity with torchreid/models/pcb.py:131-266: a torchvision
ResNet-50 trunk with last_stride=1, then AdaptiveAvgPool2d((parts, 1))
and — at inference — per-part L2 normalization over channels, flattened
channel-major to [B, 2048*parts] (pcb.py:243-246). The training-only
DimReduceLayer/classifiers are not part of the eval feature path. Params
are flat torch-named dicts with HWIO conv kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import bn, conv, max_pool

PARTS = {"pcb_p6": 6, "pcb_p4": 4}


def _bottleneck(p, pre, x, stride: int):
    residual = x
    out = jax.nn.relu(bn(p, pre + ".bn1", conv(p, pre + ".conv1", x)))
    out = jax.nn.relu(bn(p, pre + ".bn2",
                         conv(p, pre + ".conv2", out, stride=stride,
                              padding=1)))
    out = bn(p, pre + ".bn3", conv(p, pre + ".conv3", out))
    if pre + ".downsample.0.weight" in p:
        residual = bn(p, pre + ".downsample.1",
                      conv(p, pre + ".downsample.0", x, stride=stride))
    return jax.nn.relu(out + residual)


def _adaptive_avg_pool_h(x, out_h: int):
    """torch AdaptiveAvgPool2d((out_h, 1)) bin semantics:
    bin i = rows [floor(i*H/out_h), ceil((i+1)*H/out_h))."""
    h = x.shape[1]
    xw = x.mean(axis=2)                       # [B, H, C]
    parts = []
    for i in range(out_h):
        lo = (i * h) // out_h
        hi = -(-((i + 1) * h) // out_h)       # ceil
        parts.append(xw[:, lo:hi].mean(axis=1))
    return jnp.stack(parts, axis=1)           # [B, out_h, C]


def pcb_reid_forward(p, images: jnp.ndarray,
                     variant: str = "pcb_p6") -> jnp.ndarray:
    """images: [B, H, W, 3] normalized RGB NHWC -> [B, 2048*parts]."""
    parts = PARTS[variant]
    x = jax.nn.relu(bn(p, "bn1", conv(p, "conv1", images, stride=2,
                                      padding=3)))
    x = max_pool(x, 3, 2, 1)
    for li, n_blocks in enumerate((3, 4, 6, 3), start=1):
        for b in range(n_blocks):
            # last_stride=1: layer4 block 0 keeps stride 1 (pcb.py:292)
            stride = 2 if (li in (2, 3) and b == 0) else 1
            x = _bottleneck(p, f"layer{li}.{b}", x, stride)
    v = _adaptive_avg_pool_h(x, parts)        # [B, parts, C]
    # F.normalize(dim=1) on [B, C, parts, 1]: per-part L2 over channels
    v = v / jnp.sqrt((v * v).sum(axis=-1, keepdims=True) + 1e-24)
    # torch flattens [B, C, parts] channel-major
    v = jnp.swapaxes(v, 1, 2).reshape(v.shape[0], -1)
    return v.astype(jnp.float32)
