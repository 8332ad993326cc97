"""ResNet backbone (18/34/50/101/152, optional dilated c5 / SE / ResNeXt)
producing c2..c5 for FPN.

Geometry matches the reference tensorpack-style backbone *exactly* —
off-by-one here silently shifts every box (SURVEY.md hard parts):
  * input padded [3, 2+padH] top-heavy before the 7x7/2 VALID conv0
    (nn.py:871-899, maybe_reverse_pad with tf_pad_reverse=True);
  * pad (1, 0) + 3x3/2 VALID max pool;
  * stride-2 bottleneck conv2: pad (1, 0) + 3x3/2 VALID; with dilation 2 an
    extra (1, 0) pad after (nn.py:489-500);
  * stride-2 shortcut: drop last row/col then 1x1/2 VALID (nn.py:551-566) —
    on even extents this equals a plain 1x1 stride-2 conv, which is what we
    emit (our padded sizes are always even there).

TPU-native differences: NHWC activations, bf16 compute with f32 params, the
pad-to-multiple-of-32 happens at preprocessing (static shapes) so conv0's
explicit padding is just (3, 2).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from ..ops.norm import init_bn, bn_relu, frozen_bn
from .layers import conv2d, dense, init_conv, init_dense, max_pool, \
    global_avg_pool


def _split_rng(rng, n):
    return list(jax.random.split(rng, n))


# --------------------------------------------------------------------------
# init


def _init_conv_bn(rng, kernel, c_in, c_out, groups: int = 1):
    p = init_conv(rng, kernel, c_in, c_out, use_bias=False, groups=groups)
    p["bn"] = init_bn(c_out)
    return p


def init_bottleneck(rng, c_in: int, ch_out: int, use_se: bool,
                    use_resnext: bool, deformable: bool = False) -> Dict:
    rngs = _split_rng(rng, 6)
    width = ch_out * 2 if use_resnext else ch_out
    p = {
        "conv1": _init_conv_bn(rngs[0], 1, c_in, width),
        "conv2": _init_conv_bn(rngs[1], 3, width, width,
                               groups=32 if use_resnext else 1),
        "conv3": _init_conv_bn(rngs[2], 1, width, ch_out * 4),
    }
    if deformable:
        p["conv2_offset"] = init_conv(rngs[5], 3, width, 18, use_bias=True,
                                      w_init="normal", stddev=1e-8)
    if c_in != ch_out * 4:
        p["convshortcut"] = _init_conv_bn(rngs[3], 1, c_in, ch_out * 4)
    if use_se:
        p["fc1"] = init_dense(rngs[4], ch_out * 4, ch_out // 4, "xavier1")
        p["fc2"] = init_dense(rngs[5], ch_out // 4, ch_out * 4, "xavier1")
    return p


def init_basicblock(rng, c_in: int, ch_out: int) -> Dict:
    rngs = _split_rng(rng, 3)
    p = {
        "conv1": _init_conv_bn(rngs[0], 3, c_in, ch_out),
        "conv2": _init_conv_bn(rngs[1], 3, ch_out, ch_out),
    }
    if c_in != ch_out:
        p["convshortcut"] = _init_conv_bn(rngs[2], 1, c_in, ch_out)
    return p


def init_resnet(rng, num_blocks: Sequence[int], use_basic_block: bool,
                use_se: bool = False, use_resnext: bool = False,
                use_deformable: bool = False,
                modified_block_num: int = 3) -> Dict:
    rngs = _split_rng(rng, 5)
    params: Dict = {"conv0": _init_conv_bn(rngs[0], 7, 3, 64)}
    c_in = 64
    for gi, (count, feat) in enumerate(zip(num_blocks, (64, 128, 256, 512))):
        grng = _split_rng(rngs[gi + 1], count)
        group = {}
        for bi in range(count):
            if use_basic_block:
                group[f"block{bi}"] = init_basicblock(grng[bi], c_in, feat)
                c_in = feat
            else:
                # deformable applies to the last blocks of groups 1..3
                # (resnet_group modified_block_num, nn.py:976-1000)
                deform = (use_deformable and gi >= 1 and
                          bi >= count - modified_block_num)
                group[f"block{bi}"] = init_bottleneck(
                    grng[bi], c_in, feat, use_se, use_resnext,
                    deformable=deform)
                c_in = feat * 4
        params[f"group{gi}"] = group
    return params


# --------------------------------------------------------------------------
# apply


def _stride2_pad():
    # pad (1, 0): one extra row/col at the top-left (tf_pad_reverse)
    return ((1, 0), (1, 0))


def bottleneck(params, x, stride: int, dilation: int,
               use_se: bool, use_resnext: bool):
    groups = 32 if use_resnext else 1
    l = conv2d(params["conv1"], x)
    l = bn_relu(params["conv1"]["bn"], l)
    if "conv2_offset" in params:
        # deformable conv2 (nn.py:471-490): offsets from a side conv, the
        # main 3x3 samples displaced taps
        from .deformable import deformable_conv2d
        dp = {"offset": params["conv2_offset"], "W": params["conv2"]["W"]}
        l = deformable_conv2d(dp, l, stride=stride)
        l = bn_relu(params["conv2"]["bn"], l)
    elif stride == 2:
        l = conv2d(params["conv2"], l, stride=2, dilation=dilation,
                   padding=_stride2_pad(), groups=groups)
        l = bn_relu(params["conv2"]["bn"], l)
        if dilation != 1:
            # reference pads an extra (1, 0) row/col to recover H/2
            # (nn.py:495-500)
            l = jnp.pad(l, ((0, 0), (1, 0), (1, 0), (0, 0)))
    else:
        pad = dilation  # SAME for 3x3 with dilation d -> pad d
        l = conv2d(params["conv2"], l, stride=1, dilation=dilation,
                   padding=((pad, pad), (pad, pad)), groups=groups)
        l = bn_relu(params["conv2"]["bn"], l)
    l = conv2d(params["conv3"], l)
    l = frozen_bn(params["conv3"]["bn"], l)

    if use_se:
        sq = global_avg_pool(l).astype(jnp.float32)
        sq = jax.nn.relu(dense(params["fc1"], sq))
        sq = jax.nn.sigmoid(dense(params["fc2"], sq))
        l = l * sq[:, None, None, :].astype(l.dtype)

    if "convshortcut" in params:
        # stride-2 shortcut: identical to plain 1x1/2 VALID on even extents
        sc = conv2d(params["convshortcut"], x, stride=stride, padding="VALID")
        sc = frozen_bn(params["convshortcut"]["bn"], sc)
    else:
        sc = x
    return jax.nn.relu(l + sc)


def basicblock(params, x, stride: int):
    if stride == 2:
        l = conv2d(params["conv1"], x, stride=2, padding=_stride2_pad())
    else:
        l = conv2d(params["conv1"], x, stride=1, padding="SAME")
    l = bn_relu(params["conv1"]["bn"], l)
    l = conv2d(params["conv2"], l, padding="SAME")
    l = frozen_bn(params["conv2"]["bn"], l)
    if "convshortcut" in params:
        sc = conv2d(params["convshortcut"], x, stride=stride, padding="VALID")
        sc = frozen_bn(params["convshortcut"]["bn"], sc)
    else:
        sc = x
    return jax.nn.relu(l + sc)


def resnet_group(params, x, count: int, stride: int, dilation: int,
                 use_basic_block: bool, use_se: bool, use_resnext: bool,
                 modified_block_num: int = 3):
    for bi in range(count):
        p = params[f"block{bi}"]
        d = dilation if bi >= count - modified_block_num else 1
        s = stride if bi == 0 else 1
        if use_basic_block:
            x = basicblock(p, x, s)
        else:
            x = bottleneck(p, x, s, d, use_se, use_resnext)
    return x


def _stem_conv_s2d(params, image: jnp.ndarray) -> jnp.ndarray:
    """7x7/2 stem conv via 2x2 space-to-depth: mathematically identical
    (same 147 MACs per output plus zeros; kernel padded 7x7 -> 8x8 on the
    TOP/LEFT so taps stay block-aligned with padding ((3,2),(3,2))).

    THE DEFAULT STEM since round 3. History: round 2 measured s2d SLOWER
    (6.35 vs 4.68 ms at 8x736x1280 bf16) and rejected it; a backend
    update flipped the balance — round-3 in-jit-loop timing on the same
    shapes: direct conv 6.28 ms, s2d 3.03 ms (2.1x faster; the C_in=3
    direct conv lowers badly on the current compiler). Parity-tested
    bit-exactly against the direct conv; falls back to direct for odd
    extents / non-3-channel inputs."""
    b, h, w, c = image.shape
    if c == 12:
        # preprocess already emitted the s2d layout (zero relayout cost)
        x = image
    elif h % 2 or w % 2 or c != 3:
        return conv2d(params, image, stride=2, padding=((3, 2), (3, 2)))
    else:
        x = image.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    c = 3
    wk = params["W"].astype(x.dtype)                      # [7, 7, 3, O]
    wk = jnp.pad(wk, ((1, 0), (1, 0), (0, 0), (0, 0)))    # [8, 8, 3, O]
    o = wk.shape[-1]
    wk = wk.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    wk = wk.reshape(4, 4, 4 * c, o)
    out = jax.lax.conv_general_dilated(
        x, wk, (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out


def _fusable_rows(h: int) -> bool:
    """The fused stage kernel tiles rows with a divisor of h; tiny
    divisors mean pathological halo recompute — fall back to XLA."""
    return any(h % tr == 0 for tr in range(4, min(h, 64) + 1))


def resnet_c2345(params, image: jnp.ndarray, num_blocks: Sequence[int],
                 use_basic_block: bool = False, use_dilations: bool = False,
                 use_se: bool = False, use_resnext: bool = False,
                 freeze: int = 2, fused_stages: bool = False
                 ) -> List[jnp.ndarray]:
    """image: [B, Hp, Wp, 3] already padded to a multiple of 32 and
    preprocessed. Returns [c2, c3, c4, c5] NHWC.

    fused_stages: run each group's stride-1 bottleneck tail through the
    fused VMEM Pallas kernel (inference only — the XLA ops below stay the
    differentiable path). The groups' stride-2 lead blocks stay in XLA."""
    l = _stem_conv_s2d(params["conv0"], image)
    l = bn_relu(params["conv0"]["bn"], l)
    l = max_pool(l, 3, 2, padding=((1, 0), (1, 0)))

    fuse = (fused_stages and not use_basic_block and not use_se
            and not use_resnext)

    outs = []
    for gi, count in enumerate(num_blocks):
        stride = 1 if gi == 0 else 2
        dilation = 2 if (use_dilations and gi == 3) else 1
        group = params[f"group{gi}"]
        blocks = [group[f"block{bi}"] for bi in range(count)]
        h_out = l.shape[1] // stride
        if (fuse and dilation == 1 and _fusable_rows(h_out)
                and not any("conv2_offset" in b for b in blocks)):
            from ..ops.pallas.resnet_stage_pallas import (
                fused_bottleneck_stage)
            feat = (64, 128, 256, 512)[gi]
            start = 0
            if stride == 2:
                # the stride-2 lead block stays in XLA (the kernel is
                # stride-1 only); a stride-1 channel-change lead (c2's
                # block0) fuses — the kernel takes a first-block shortcut
                l = bottleneck(blocks[0], l, stride, 1, False, False)
                start = 1
            # fuse the stride-1 tail in VMEM-sized chunks of <=3 blocks
            # (halo recompute grows with chunk depth)
            from ..ops.pallas.resnet_stage_pallas import _pick_tr
            rest = blocks[start:]
            i = 0
            while i < len(rest):
                chunk = rest[i:i + 3]
                tr = _pick_tr(l.shape[1], l.shape[2], l.shape[3],
                              feat, feat * 4, len(chunk))
                if tr >= 4:
                    l = fused_bottleneck_stage(chunk, l, feat, feat * 4)
                else:
                    # VMEM budget forces a tiny row tile here (e.g. c5's
                    # H=23 at 720p) — halo recompute would dominate
                    for blk in chunk:
                        l = bottleneck(blk, l, 1, 1, False, False)
                i += len(chunk)
        else:
            l = resnet_group(
                group, l, count, stride, dilation,
                use_basic_block, use_se, use_resnext)
        if freeze >= gi:
            l = jax.lax.stop_gradient(l)
        outs.append(l)
    return outs
