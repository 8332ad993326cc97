"""OSNet x1.0 inference forward (Zhou et al., ICCV 2019).

Architecture parity with torchreid osnet.py (vendored at reference
torchreid/models/osnet.py): ConvLayer stem, three stages of 2 OSBlocks
(channels 256/384/512, x1.0) with Conv1x1+avgpool transitions, Conv1x1
head, GAP, 512-d fc + BN1d + relu. Params: flat dict with the torch
state_dict names, conv kernels pre-transposed to HWIO.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import avg_pool2, bn, conv, global_avg_pool, linear, max_pool


def _conv_layer(p, pre, x, stride=1, padding=0, k7=False):
    x = conv(p, pre + ".conv", x, stride=stride, padding=padding)
    if pre + ".bn.running_mean" not in p:  # osnet_ibn: IN stem
        return jax.nn.relu(_instance_norm(p, pre + ".bn", x))
    return jax.nn.relu(bn(p, pre + ".bn", x))


def _conv1x1(p, pre, x):
    x = conv(p, pre + ".conv", x)
    return jax.nn.relu(bn(p, pre + ".bn", x))


def _conv1x1_linear(p, pre, x):
    x = conv(p, pre + ".conv", x)
    return bn(p, pre + ".bn", x)


def _light_conv3x3(p, pre, x):
    x = conv(p, pre + ".conv1", x)
    c = x.shape[-1]
    x = conv(p, pre + ".conv2", x, padding=1, groups=c)
    return jax.nn.relu(bn(p, pre + ".bn", x))


def _channel_gate(p, pre, x):
    v = global_avg_pool(x)[:, None, None, :]
    v = jax.nn.relu(conv(p, pre + ".fc1", v))
    v = jax.nn.sigmoid(conv(p, pre + ".fc2", v))
    return x * v


def _os_block(p, pre, x):
    identity = x
    x1 = _conv1x1(p, pre + ".conv1", x)
    x2a = _light_conv3x3(p, pre + ".conv2a", x1)
    x2b = x1
    for i in range(2):
        x2b = _light_conv3x3(p, f"{pre}.conv2b.{i}", x2b)
    x2c = x1
    for i in range(3):
        x2c = _light_conv3x3(p, f"{pre}.conv2c.{i}", x2c)
    x2d = x1
    for i in range(4):
        x2d = _light_conv3x3(p, f"{pre}.conv2d.{i}", x2d)
    g = pre + ".gate"
    x2 = (_channel_gate(p, g, x2a) + _channel_gate(p, g, x2b) +
          _channel_gate(p, g, x2c) + _channel_gate(p, g, x2d))
    x3 = _conv1x1_linear(p, pre + ".conv3", x2)
    if pre + ".downsample.conv.weight" in p:
        identity = _conv1x1_linear(p, pre + ".downsample", identity)
    out = x3 + identity
    if pre + ".IN.weight" in p:  # osnet_ibn: IN after the residual add
        out = _instance_norm(p, pre + ".IN", out)
    return jax.nn.relu(out)


def _fc_head(p, x):
    v = global_avg_pool(x).astype(jnp.float32)
    v = linear(p, "fc.0", v)
    # BN1d
    scale = p["fc.1.weight"] / jnp.sqrt(p["fc.1.running_var"] + 1e-5)
    v = v * scale + (p["fc.1.bias"] - p["fc.1.running_mean"] * scale)
    return jax.nn.relu(v)


def osnet_forward(p, images: jnp.ndarray) -> jnp.ndarray:
    """images: [B, 256, 128, 3] normalized RGB NHWC -> features [B, 512]."""
    x = _conv_layer(p, "conv1", images, stride=2, padding=3)
    x = max_pool(x, 3, 2, 1)
    for stage, n_blocks in (("conv2", 2), ("conv3", 2), ("conv4", 2)):
        for i in range(n_blocks):
            x = _os_block(p, f"{stage}.{i}", x)
        if stage != "conv4":
            x = _conv1x1(p, f"{stage}.2.0", x)
            x = avg_pool2(x)
    x = _conv1x1(p, "conv5", x)
    return _fc_head(p, x)


# --------------------------------------------------------------------------
# OSNet-AIN (Zhou et al., TPAMI 2021; torchreid/models/osnet_ain.py):
# instance normalization in the stem and inside selected blocks, and
# LightConvStream naming (conv2.{t}.layers.{i}) for the omni-scale streams.


def _instance_norm(p, pre, x):
    """Affine InstanceNorm2d, eval mode (per-sample HW statistics)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    xn = (x - mean) / jnp.sqrt(var + 1e-5)
    return xn * p[pre + ".weight"].astype(x.dtype) + \
        p[pre + ".bias"].astype(x.dtype)


def _os_block_ain(p, pre, x, inin: bool):
    identity = x
    x1 = _conv1x1(p, pre + ".conv1", x)
    x2 = None
    for t in range(4):   # T=4 streams; stream t chains t+1 LightConv3x3
        xt = x1
        for i in range(t + 1):
            xt = _light_conv3x3(p, f"{pre}.conv2.{t}.layers.{i}", xt)
        g = _channel_gate(p, pre + ".gate", xt)
        x2 = g if x2 is None else x2 + g
    if inin:
        # OSBlockINin: conv3 has no bn; affine IN inside the residual
        x3 = conv(p, pre + ".conv3.conv", x2)
        x3 = _instance_norm(p, pre + ".IN", x3)
    else:
        x3 = _conv1x1_linear(p, pre + ".conv3", x2)
    if pre + ".downsample.conv.weight" in p:
        identity = _conv1x1_linear(p, pre + ".downsample", identity)
    return jax.nn.relu(x3 + identity)


# per-stage OSBlockINin flags for osnet_ain_x1_0 (osnet_ain.py:524-537)
_AIN_BLOCKS = {"conv2": (True, True), "conv3": (False, True),
               "conv4": (True, False)}


def osnet_ain_forward(p, images: jnp.ndarray) -> jnp.ndarray:
    """osnet_ain_x1_0: IN stem + mixed OSBlock/OSBlockINin stages with
    separate pool2/pool3 transitions."""
    x = conv(p, "conv1.conv", images, stride=2, padding=3)
    x = jax.nn.relu(_instance_norm(p, "conv1.bn", x))
    x = max_pool(x, 3, 2, 1)
    for stage in ("conv2", "conv3", "conv4"):
        for i, inin in enumerate(_AIN_BLOCKS[stage]):
            x = _os_block_ain(p, f"{stage}.{i}", x, inin)
        if stage != "conv4":
            pool = "pool2" if stage == "conv2" else "pool3"
            x = _conv1x1(p, f"{pool}.0", x)
            x = avg_pool2(x)
    x = _conv1x1(p, "conv5", x)
    return _fc_head(p, x)
