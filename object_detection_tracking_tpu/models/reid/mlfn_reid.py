"""MLFN (Multi-Level Factorisation Net) ReID forward.

Architecture parity with torchreid/models/mlfn.py:16-259: 16 MLFN blocks,
each with a factor module (1x1 reduce -> grouped 3x3 -> 1x1 expand) gated
per channel-group by a factor-selection module (GAP -> two 1x1+BN+ReLU ->
1x1 to `groups` -> BN -> sigmoid); the final embedding averages fc_x over
the last feature map with fc_s over the concatenated 16 selection
vectors. Params are flat torch-named dicts with HWIO conv kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import bn, conv, max_pool

GROUPS = 32
N_BLOCKS = 16
# stride-2 blocks (mlfn.py:128-176): stage transitions at blocks 3, 7, 13
STRIDE2 = (3, 7, 13)


def _fsm(p, pre, x):
    s = x.mean(axis=(1, 2), keepdims=True)
    s = jax.nn.relu(bn(p, pre + ".2", conv(p, pre + ".1", s)))
    s = jax.nn.relu(bn(p, pre + ".5", conv(p, pre + ".4", s)))
    return jax.nn.sigmoid(bn(p, pre + ".8", conv(p, pre + ".7", s)))


def _block(p, pre, x, stride):
    residual = x
    s = _fsm(p, pre + ".fsm", x)              # [B, 1, 1, groups]
    out = jax.nn.relu(bn(p, pre + ".fm_bn1", conv(p, pre + ".fm_conv1", x)))
    out = jax.nn.relu(bn(p, pre + ".fm_bn2",
                         conv(p, pre + ".fm_conv2", out, stride=stride,
                              padding=1, groups=GROUPS)))
    # factor selection: group g's contiguous n channels all scale by s[g]
    n = out.shape[-1] // GROUPS
    out = out * jnp.repeat(s, n, axis=-1)
    out = jax.nn.relu(bn(p, pre + ".fm_bn3", conv(p, pre + ".fm_conv3",
                                                  out)))
    if pre + ".downsample.0.weight" in p:
        residual = bn(p, pre + ".downsample.1",
                      conv(p, pre + ".downsample.0", x, stride=stride))
    return jax.nn.relu(residual + out), s


def mlfn_reid_forward(p, images: jnp.ndarray,
                      variant: str = "mlfn") -> jnp.ndarray:
    """images: [B, H, W, 3] normalized RGB NHWC -> [B, 1024] features."""
    del variant
    x = jax.nn.relu(bn(p, "bn1", conv(p, "conv1", images, stride=2,
                                      padding=3)))
    x = max_pool(x, 3, 2, 1)
    s_all = []
    for i in range(N_BLOCKS):
        x, s = _block(p, f"feature.{i}", x, 2 if i in STRIDE2 else 1)
        s_all.append(s)
    s_hat = jnp.concatenate(s_all, axis=-1)   # [B, 1, 1, groups*16]
    v_x = jax.nn.relu(bn(p, "fc_x.1",
                         conv(p, "fc_x.0",
                              x.mean(axis=(1, 2), keepdims=True))))
    v_s = jax.nn.relu(bn(p, "fc_s.1", conv(p, "fc_s.0", s_hat)))
    v = 0.5 * (v_x + v_s)
    return v.reshape(v.shape[0], -1).astype(jnp.float32)
