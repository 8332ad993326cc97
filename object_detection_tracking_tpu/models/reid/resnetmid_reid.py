"""resnet50mid ReID forward: ResNet-50 with mid-level feature fusion.

Architecture parity with torchreid/models/resnetmid.py:108-266: standard
ResNet-50 trunk; the three layer4 block outputs are GAP'd separately,
the first two are concatenated and passed through fc_fusion
(Linear+BN1d+ReLU, 4096->1024), and the result is concatenated with the
third GAP to give [B, 3072] features. Params are flat torch-named dicts
with HWIO conv kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import bn, conv, global_avg_pool, linear, max_pool
from .pcb_reid import _bottleneck


def resnetmid_reid_forward(p, images: jnp.ndarray,
                           variant: str = "resnet50mid") -> jnp.ndarray:
    """images: [B, H, W, 3] normalized RGB NHWC -> [B, 3072] features."""
    del variant
    x = jax.nn.relu(bn(p, "bn1", conv(p, "conv1", images, stride=2,
                                      padding=3)))
    x = max_pool(x, 3, 2, 1)
    for li, n_blocks in enumerate((3, 4, 6), start=1):
        for b in range(n_blocks):
            stride = 2 if (li > 1 and b == 0) else 1
            x = _bottleneck(p, f"layer{li}.{b}", x, stride)
    x4a = _bottleneck(p, "layer4.0", x, 2)
    x4b = _bottleneck(p, "layer4.1", x4a, 1)
    x4c = _bottleneck(p, "layer4.2", x4b, 1)
    v4ab = jnp.concatenate(
        [global_avg_pool(x4a), global_avg_pool(x4b)], axis=-1)
    v4ab = jnp.maximum(bn(p, "fc_fusion.1", linear(p, "fc_fusion.0", v4ab)),
                       0.0)
    v = jnp.concatenate([v4ab, global_avg_pool(x4c)], axis=-1)
    return v.astype(jnp.float32)
