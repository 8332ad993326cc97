"""DenseNet ReID forwards (densenet121/169/201/161, densenet121_fc512).

Architecture parity with the reference's vendored torchvision-style
DenseNet (torchreid/models/densenet.py:29-185): stem 7x7/2 conv + BN +
ReLU + 3x3/2 maxpool; dense blocks of [BN-ReLU-1x1 conv-BN-ReLU-3x3 conv]
layers whose outputs concatenate onto the running feature map; transition
[BN-ReLU-1x1 conv-2x2 avgpool] between blocks; final BN (norm5) + ReLU +
GAP (+ optional fc head). The block/layer structure is discovered from the
checkpoint names (features.denseblockB.denselayerL.*), so every width
variant shares this one forward. Params are flat torch-named dicts with
HWIO conv kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import avg_pool2, bn, conv, global_avg_pool, linear, max_pool


def _structure(p):
    """(n_layers per denseblock) inferred from param names."""
    blocks = []
    b = 1
    while f"features.denseblock{b}.denselayer1.norm1.weight" in p:
        n = 1
        while (f"features.denseblock{b}.denselayer{n + 1}.norm1.weight"
               in p):
            n += 1
        blocks.append(n)
        b += 1
    return blocks


def densenet_reid_forward(p, images: jnp.ndarray,
                          variant: str = "densenet121") -> jnp.ndarray:
    """images: [B, H, W, 3] normalized RGB NHWC -> GAP features."""
    del variant  # structure comes from the param names
    x = jax.nn.relu(bn(p, "features.norm0",
                       conv(p, "features.conv0", images, stride=2,
                            padding=3)))
    x = max_pool(x, 3, 2, 1)
    blocks = _structure(p)
    for bi, n_layers in enumerate(blocks, start=1):
        for li in range(1, n_layers + 1):
            pre = f"features.denseblock{bi}.denselayer{li}"
            out = jax.nn.relu(bn(p, pre + ".norm1", x))
            out = conv(p, pre + ".conv1", out)
            out = jax.nn.relu(bn(p, pre + ".norm2", out))
            out = conv(p, pre + ".conv2", out, padding=1)
            x = jnp.concatenate([x, out], axis=-1)
        if bi != len(blocks):
            pre = f"features.transition{bi}"
            x = jax.nn.relu(bn(p, pre + ".norm", x))
            x = conv(p, pre + ".conv", x)
            x = avg_pool2(x)
    x = jax.nn.relu(bn(p, "features.norm5", x))
    v = global_avg_pool(x)
    if "fc.0.weight" in p:
        v = jnp.maximum(bn(p, "fc.1", linear(p, "fc.0", v)), 0.0)
    return v.astype(jnp.float32)
