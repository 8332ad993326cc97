"""ShuffleNetV2 ReID forwards (shufflenet_v2_x0_5 / x1_0 / x1_5 / x2_0).

Architecture parity with the reference's vendored ShuffleNetV2
(torchreid/models/shufflenetv2.py:24-196): 3x3/2 stem conv + maxpool;
three stages of InvertedResidual units — the stride-2 unit runs both
branches on the full input, the stride-1 units split channels in half and
transform only the second half — each followed by a groups=2 channel
shuffle; 1x1 conv5; GAP features. Stage depths are discovered from the
checkpoint names, so all width variants share this forward. Params are
flat torch-named dicts with HWIO conv kernels (depthwise [k,k,1,C]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import bn, conv, global_avg_pool, max_pool


def _channel_shuffle(x, groups=2):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


def _branch2(p, pre, x, stride):
    out = jax.nn.relu(bn(p, pre + ".1", conv(p, pre + ".0", x)))
    dw = p[pre + ".3.weight"]
    out = bn(p, pre + ".4", conv(p, pre + ".3", out, stride=stride,
                                 padding=1, groups=dw.shape[-1]))
    return jax.nn.relu(bn(p, pre + ".6", conv(p, pre + ".5", out)))


def _unit(p, pre, x, stride):
    if stride == 1:
        c = x.shape[-1] // 2
        x1, x2 = x[..., :c], x[..., c:]
        out = jnp.concatenate([x1, _branch2(p, pre + ".branch2", x2, 1)],
                              axis=-1)
    else:
        dw = p[pre + ".branch1.0.weight"]
        b1 = bn(p, pre + ".branch1.1",
                conv(p, pre + ".branch1.0", x, stride=stride, padding=1,
                     groups=dw.shape[-1]))
        b1 = jax.nn.relu(bn(p, pre + ".branch1.3",
                            conv(p, pre + ".branch1.2", b1)))
        out = jnp.concatenate(
            [b1, _branch2(p, pre + ".branch2", x, stride)], axis=-1)
    return _channel_shuffle(out)


def shufflenetv2_reid_forward(p, images: jnp.ndarray,
                              variant: str = "shufflenet_v2_x1_0"
                              ) -> jnp.ndarray:
    """images: [B, H, W, 3] normalized RGB NHWC -> GAP features."""
    del variant
    x = jax.nn.relu(bn(p, "conv1.1", conv(p, "conv1.0", images, stride=2,
                                          padding=1)))
    x = max_pool(x, 3, 2, 1)
    for stage in (2, 3, 4):
        u = 0
        while f"stage{stage}.{u}.branch2.0.weight" in p:
            x = _unit(p, f"stage{stage}.{u}", x, 2 if u == 0 else 1)
            u += 1
    x = jax.nn.relu(bn(p, "conv5.1", conv(p, "conv5.0", x)))
    return global_avg_pool(x).astype(jnp.float32)
