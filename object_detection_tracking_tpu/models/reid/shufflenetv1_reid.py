"""ShuffleNet (v1, groups=3) ReID forward.

Architecture parity with torchreid/models/shufflenet.py:16-196: stem
3x3/2 conv + BN + ReLU + maxpool; stages of grouped-1x1 -> channel
shuffle -> depthwise 3x3 -> grouped-1x1 bottlenecks; stride-2 units
concatenate an avg-pooled shortcut, stride-1 units add the residual.
The group count is recovered from the conv3 kernel shape, and stage
depths from the checkpoint names. Params are flat torch-named dicts with
HWIO conv kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import bn, conv, global_avg_pool, max_pool


def _shuffle(x, groups):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


def _avg_pool_3_2_1(x):
    """torch AvgPool2d(3, stride=2, padding=1): zero-pad, divide by the
    FULL window size (count_include_pad=True default)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / 9.0


def _unit(p, pre, x, stride):
    mid = p[pre + ".bn1.weight"].shape[0]
    # groups = conv input channels / kernel per-group input depth
    groups = mid // p[pre + ".conv3.weight"].shape[2]
    g1 = x.shape[-1] // p[pre + ".conv1.weight"].shape[2]  # 1 at stage2 entry
    out = jax.nn.relu(bn(p, pre + ".bn1", conv(p, pre + ".conv1", x,
                                               groups=g1)))
    out = _shuffle(out, groups)
    out = bn(p, pre + ".bn2", conv(p, pre + ".conv2", out, stride=stride,
                                   padding=1, groups=mid))
    out = bn(p, pre + ".bn3", conv(p, pre + ".conv3", out, groups=groups))
    if stride == 2:
        return jax.nn.relu(
            jnp.concatenate([_avg_pool_3_2_1(x), out], axis=-1))
    return jax.nn.relu(x + out)


def shufflenetv1_reid_forward(p, images: jnp.ndarray,
                              variant: str = "shufflenet") -> jnp.ndarray:
    """images: [B, H, W, 3] normalized RGB NHWC -> GAP features."""
    del variant
    x = jax.nn.relu(bn(p, "conv1.1", conv(p, "conv1.0", images, stride=2,
                                          padding=1)))
    x = max_pool(x, 3, 2, 1)
    for stage in (2, 3, 4):
        u = 0
        while f"stage{stage}.{u}.conv1.weight" in p:
            x = _unit(p, f"stage{stage}.{u}", x, 2 if u == 0 else 1)
            u += 1
    return global_avg_pool(x).astype(jnp.float32)
