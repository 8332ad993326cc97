"""Xception ReID forward.

Architecture parity with torchreid/models/xception.py:26-305: unpadded
3x3/2 + 3x3 stem; 12 depthwise-separable blocks with 1x1-conv skips and
stride-2 maxpool exits (entry blocks 1-3, middle 4-11, exit 12 with
grow_first=False); separable conv3/conv4 tail; GAP (+ optional fc head).
The rep-Sequential indices depend on start_with_relu, so each block's op
list is rebuilt exactly as the torch ctor does. Params are flat
torch-named dicts with HWIO conv kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import bn, conv, global_avg_pool, linear, max_pool

# (in, out, reps, stride, start_with_relu, grow_first) per block
# (xception.py:168-206)
_BLOCKS = (
    (64, 128, 2, 2, False, True),
    (128, 256, 2, 2, True, True),
    (256, 728, 2, 2, True, True),
) + ((728, 728, 3, 1, True, True),) * 8 + (
    (728, 1024, 2, 2, True, False),
)


def _sep_conv(p, pre, x, stride=1, padding=1):
    dw = p[pre + ".conv1.weight"]
    x = conv(p, pre + ".conv1", x, stride=stride, padding=padding,
             groups=dw.shape[-1])
    return conv(p, pre + ".pointwise", x)


def _block(p, pre, x, cfg):
    _, _, reps, stride, start_relu, grow_first = cfg
    ops = []
    if grow_first:
        ops += ["relu", "sep", "bn"]
    for _ in range(reps - 1):
        ops += ["relu", "sep", "bn"]
    if not grow_first:
        ops += ["relu", "sep", "bn"]
    if not start_relu:
        ops = ops[1:]
    out = x
    for i, op in enumerate(ops):
        if op == "relu":
            out = jax.nn.relu(out)
        elif op == "sep":
            out = _sep_conv(p, f"{pre}.rep.{i}", out)
        else:
            out = bn(p, f"{pre}.rep.{i}", out)
    if stride != 1:
        out = max_pool(out, 3, stride, 1)
    if pre + ".skip.weight" in p:
        skip = bn(p, pre + ".skipbn", conv(p, pre + ".skip", x,
                                           stride=stride))
    else:
        skip = x
    return out + skip


def xception_reid_forward(p, images: jnp.ndarray,
                          variant: str = "xception") -> jnp.ndarray:
    """images: [B, H, W, 3] normalized RGB NHWC -> [B, 2048] features."""
    del variant
    x = jax.nn.relu(bn(p, "bn1", conv(p, "conv1", images, stride=2)))
    x = jax.nn.relu(bn(p, "bn2", conv(p, "conv2", x)))
    for bi, cfg in enumerate(_BLOCKS, start=1):
        x = _block(p, f"block{bi}", x, cfg)
    x = jax.nn.relu(bn(p, "bn3", _sep_conv(p, "conv3", x)))
    x = jax.nn.relu(bn(p, "bn4", _sep_conv(p, "conv4", x)))
    v = global_avg_pool(x)
    if "fc.0.weight" in p:
        v = jnp.maximum(bn(p, "fc.1", linear(p, "fc.0", v)), 0.0)
    return v.astype(jnp.float32)
