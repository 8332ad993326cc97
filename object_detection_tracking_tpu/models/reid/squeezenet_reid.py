"""SqueezeNet ReID forwards (squeezenet1_0, squeezenet1_1,
squeezenet1_0_fc512).

Architecture parity with the reference's vendored SqueezeNet
(torchreid/models/squeezenet.py:19-114): stem conv (7x7/2 for v1.0, 3x3/2
for v1.1, both unpadded, with bias) + ReLU + ceil-mode maxpool; Fire
modules (1x1 squeeze -> ReLU -> concat[1x1 expand, 3x3 expand] both
ReLU'd); maxpools interleaved per version; GAP (+ optional fc head).
Params are flat torch-named dicts ("features.<idx>....") with HWIO conv
kernels; the version is detected from the stem kernel size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import bn, ceil_max_pool, conv, global_avg_pool, linear

# Sequential slot layout per version (squeezenet.py:79-109). "P" is a
# parameterless maxpool; integers are Fire module slots.
_V10 = [3, 4, 5, "P", 7, 8, 9, 10, "P", 12]
_V11 = [3, 4, "P", 6, 7, "P", 9, 10, 11, 12]


def _fire(p, pre, x):
    s = jax.nn.relu(conv(p, pre + ".squeeze", x))
    e1 = jax.nn.relu(conv(p, pre + ".expand1x1", s))
    e3 = jax.nn.relu(conv(p, pre + ".expand3x3", s, padding=1))
    return jnp.concatenate([e1, e3], axis=-1)


def squeezenet_reid_forward(p, images: jnp.ndarray,
                            variant: str = "squeezenet1_0") -> jnp.ndarray:
    """images: [B, H, W, 3] normalized RGB NHWC -> [B, 512] GAP features."""
    del variant
    v10 = p["features.0.weight"].shape[0] == 7  # stem kernel size
    x = jax.nn.relu(conv(p, "features.0", images, stride=2))
    x = ceil_max_pool(x)
    for slot in (_V10 if v10 else _V11):
        if slot == "P":
            x = ceil_max_pool(x)
        else:
            x = _fire(p, f"features.{slot}", x)
    v = global_avg_pool(x)
    if "fc.0.weight" in p:
        v = jnp.maximum(bn(p, "fc.1", linear(p, "fc.0", v)), 0.0)
    return v.astype(jnp.float32)
