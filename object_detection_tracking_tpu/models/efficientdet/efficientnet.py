"""EfficientNet-B0..B7 + lite0..lite4 backbone (Tan & Le, ICML 2019),
inference forward.

Architecture parity with the vendored builder (reference
efficientdet/backbone/efficientnet_builder.py, efficientnet_model.py):
stem conv 3x3/2 + MBConv block groups with SE and swish, width/depth
compound scaling with the divisor-8 filter rounding. Returns the C3/C4/C5
reduction endpoints for the BiFPN.

Lite variants (reference efficientnet_lite_builder.py:37-84): relu6
instead of swish, NO squeeze-excite, and fix_head_stem — the stem stays
32 filters and the first/last block groups keep unscaled repeats
(efficientnet_model.py:518,541); block filters still width-scale.
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp

from ...ops.norm import init_bn, frozen_bn
from ..layers import conv2d, init_conv

# (kernel, stride, expand, in_filters, out_filters, repeats) for B0
BLOCK_ARGS = [
    (3, 1, 1, 32, 16, 1),
    (3, 2, 6, 16, 24, 2),
    (5, 2, 6, 24, 40, 2),
    (3, 2, 6, 40, 80, 3),
    (5, 1, 6, 80, 112, 3),
    (5, 2, 6, 112, 192, 4),
    (3, 1, 6, 192, 320, 1),
]
SE_RATIO = 0.25

# width_coefficient, depth_coefficient
# (reference efficientdet/backbone/efficientnet_builder.py:37-48)
SCALING = {
    "efficientnet-b0": (1.0, 1.0),
    "efficientnet-b1": (1.0, 1.1),
    "efficientnet-b2": (1.1, 1.2),
    "efficientnet-b3": (1.2, 1.4),
    "efficientnet-b4": (1.4, 1.8),
    "efficientnet-b5": (1.6, 2.2),
    "efficientnet-b6": (1.8, 2.6),
    "efficientnet-b7": (2.0, 3.1),
    # lite (reference efficientnet_lite_builder.py:40-46)
    "efficientnet-lite0": (1.0, 1.0),
    "efficientnet-lite1": (1.0, 1.1),
    "efficientnet-lite2": (1.1, 1.2),
    "efficientnet-lite3": (1.2, 1.4),
    "efficientnet-lite4": (1.4, 1.8),
}


def is_lite(model_name: str) -> bool:
    return "lite" in model_name


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def swish(x):
    return x * jax.nn.sigmoid(x)


def scaled_block_args(model_name: str):
    w, d = SCALING[model_name]
    lite = is_lite(model_name)
    out = []
    for gi, (k, s, e, i, o, r) in enumerate(BLOCK_ARGS):
        # lite fix_head_stem: first/last groups keep unscaled repeats
        # (efficientnet_model.py:541-544)
        rr = r if lite and gi in (0, len(BLOCK_ARGS) - 1) \
            else round_repeats(r, d)
        out.append((k, s, e, round_filters(i, w), round_filters(o, w), rr))
    return out


# --------------------------------------------------------------------------


def _init_conv_bn(rng, kernel, cin, cout, groups=1):
    p = init_conv(rng, kernel, cin, cout, use_bias=False,
                  w_init="msra_fanout", groups=groups)
    p["bn"] = init_bn(cout)
    return p


def init_mbconv(rng, kernel, expand, cin, cout, use_se: bool = True):
    rngs = jax.random.split(rng, 5)
    mid = cin * expand
    p: Dict = {}
    if expand != 1:
        p["expand"] = _init_conv_bn(rngs[0], 1, cin, mid)
    p["dw"] = _init_conv_bn(rngs[1], kernel, mid, mid, groups=mid)
    if use_se:
        se_ch = max(1, int(cin * SE_RATIO))
        p["se_reduce"] = init_conv(rngs[2], 1, mid, se_ch, use_bias=True)
        p["se_expand"] = init_conv(rngs[3], 1, se_ch, mid, use_bias=True)
    p["project"] = _init_conv_bn(rngs[4], 1, mid, cout)
    return p


def init_efficientnet(rng, model_name: str) -> Dict:
    w, _ = SCALING[model_name]
    lite = is_lite(model_name)
    args = scaled_block_args(model_name)
    rngs = jax.random.split(rng, 2 + sum(a[-1] for a in args))
    # lite fix_head_stem: stem stays 32 (efficientnet_model.py:518)
    stem_ch = 32 if lite else round_filters(32, w)
    params: Dict = {"stem": _init_conv_bn(rngs[0], 3, 3, stem_ch)}
    ri = 1
    cin = stem_ch
    use_se = not lite  # lite drops SE (efficientnet_lite_builder.py:83)
    for gi, (k, s, e, i, o, r) in enumerate(args):
        group = {}
        for bi in range(r):
            group[f"block{bi}"] = init_mbconv(
                rngs[ri], k, e, cin if bi == 0 else o, o, use_se=use_se)
            ri += 1
        cin = o
        params[f"group{gi}"] = group
    return params


def relu6(x):
    return jnp.minimum(jax.nn.relu(x), 6.0)


def _maybe_se(p, x, act):
    """Squeeze-excite when the block has SE params (lite blocks don't)."""
    if "se_reduce" not in p:
        return x
    se = x.mean(axis=(1, 2), keepdims=True)
    se = act(conv2d(p["se_reduce"], se))
    se = jax.nn.sigmoid(conv2d(p["se_expand"], se))
    return x * se


def mbconv(p, x, kernel, stride, expand, act=swish, bn=frozen_bn):
    inp = x
    if expand != 1:
        x = act(bn(p["expand"]["bn"], conv2d(p["expand"], x)))
    pad = kernel // 2
    x = conv2d(p["dw"], x, stride=stride, padding=((pad, pad), (pad, pad)),
               groups=x.shape[-1])
    x = act(bn(p["dw"]["bn"], x))
    x = _maybe_se(p, x, act)
    x = bn(p["project"]["bn"], conv2d(p["project"], x))
    if stride == 1 and inp.shape[-1] == x.shape[-1]:
        x = x + inp
    return x


def efficientnet_c345(params, images: jnp.ndarray,
                      model_name: str, bn=frozen_bn) -> List[jnp.ndarray]:
    """images [B, H, W, 3] (H, W multiples of 128) -> [C3, C4, C5]
    (strides 8, 16, 32)."""
    args = scaled_block_args(model_name)
    act = relu6 if is_lite(model_name) else swish
    x = conv2d(params["stem"], images, stride=2, padding=((0, 1), (0, 1)))
    x = act(bn(params["stem"]["bn"], x))
    endpoints = []
    for gi, (k, s, e, i, o, r) in enumerate(args):
        for bi in range(r):
            stride = s if bi == 0 else 1
            if stride == 2:
                endpoints.append(x)  # feature before this reduction
            pd = params[f"group{gi}"][f"block{bi}"]
            if stride == 2 and k > 1:
                # TF 'same' padding for even input: pad (k//2-1, k//2)
                x = mbconv_stride2(pd, x, k, e, act=act, bn=bn)
            else:
                x = mbconv(pd, x, k, stride, e, act=act, bn=bn)
    endpoints.append(x)
    # endpoints: [C1(s2), C2(s4), C3(s8), C4(s16), C5(s32)]
    return endpoints[-3:]


def mbconv_stride2(p, x, kernel, expand, act=swish, bn=frozen_bn):
    """MBConv with stride-2 depthwise using TF SAME padding on even dims."""
    if expand != 1:
        x = act(bn(p["expand"]["bn"], conv2d(p["expand"], x)))
    lo = kernel // 2 - 1
    hi = kernel // 2
    x = conv2d(p["dw"], x, stride=2, padding=((lo, hi), (lo, hi)),
               groups=x.shape[-1])
    x = act(bn(p["dw"]["bn"], x))
    x = _maybe_se(p, x, act)
    return bn(p["project"]["bn"], conv2d(p["project"], x))
