"""NASNet-A-Mobile ReID forward.

Architecture parity with torchreid/models/nasnet.py:52-1110 (the Cadene
port of NASNet-A (4 @ 1056)): unpadded 3x3/2 stem conv, two stem cells,
then three stages of [FirstCell + 3 NormalCells] joined by reduction
cells. The torch graph's asymmetric-shift quirks are reproduced exactly:
MaxPoolPad/AvgPoolPad (zero-pad top-left, pool, drop first row/col),
'specific'/reduction separable branches (zero-pad top-left before the
strided depthwise conv, drop first row/col after), and the path-2
right/bottom-shifted stride-2 subsampling. All BNs use eps=1e-3. Params
are flat torch-named dicts with HWIO conv kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import avg_pool_excl, bn, conv, global_avg_pool

_EPS = 1e-3


def _pad_tl(x):
    """ZeroPad2d((1, 0, 1, 0)): one zero row on top, one column on left."""
    return jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))


def _maxpool_3_2_1(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def _max_pool_pad(x):
    return _maxpool_3_2_1(_pad_tl(x))[:, 1:, 1:, :]


def _avg_pool_pad(x):
    return avg_pool_excl(_pad_tl(x), 3, 2, 1)[:, 1:, 1:, :]


def _relu_conv_bn(p, pre, x):
    """conv_1x1 / conv_prev_1x1 blocks: ReLU -> 1x1 conv -> BN."""
    return bn(p, pre + ".bn", conv(p, pre + ".conv", jax.nn.relu(x)),
              eps=_EPS)


def _sep(p, pre, x, stride, padding):
    dw = p[pre + ".depthwise_conv2d.weight"]
    x = conv(p, pre + ".depthwise_conv2d", x, stride=stride, padding=padding,
             groups=dw.shape[-1])
    return conv(p, pre + ".pointwise_conv2d", x)


def _branch_sep(p, pre, x, k, stride, shift=False):
    """BranchSeparables (nasnet.py:113-155); shift=True reproduces the
    'specific'/reduction variant's pad-then-crop around separable_1."""
    pad = k // 2
    x = jax.nn.relu(x)
    if shift:
        x = _pad_tl(x)
    x = _sep(p, pre + ".separable_1", x, stride, pad)
    if shift:
        x = x[:, 1:, 1:, :]
    x = jax.nn.relu(bn(p, pre + ".bn_sep_1", x, eps=_EPS))
    x = _sep(p, pre + ".separable_2", x, 1, pad)
    return bn(p, pre + ".bn_sep_2", x, eps=_EPS)


def _stem_branch(p, pre, x, k, stride):
    """BranchSeparablesStem (channels change in separable_1)."""
    return _branch_sep(p, pre, x, k, stride, shift=False)


def _shifted_paths(p, pre, x):
    """relu -> two stride-2 subsample paths (path_2 shifted by one pixel
    right/bottom) -> concat -> BN (nasnet.py:536-548 fwd semantics)."""
    x = jax.nn.relu(x)
    p1 = conv(p, pre + ".path_1.conv", x[:, ::2, ::2, :])
    # pad (0,1,0,1) then drop first row/col == shift grid by +1
    xs = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, 1:, 1:, :]
    p2 = conv(p, pre + ".path_2.conv", xs[:, ::2, ::2, :])
    return bn(p, pre + ".final_path_bn",
              jnp.concatenate([p1, p2], axis=-1), eps=_EPS)


def _cell_stem_0(p, pre, x):
    x1 = _relu_conv_bn(p, pre + ".conv_1x1", x)
    c0 = (_branch_sep(p, pre + ".comb_iter_0_left", x1, 5, 2) +
          _stem_branch(p, pre + ".comb_iter_0_right", x, 7, 2))
    c1 = (_maxpool_3_2_1(x1) +
          _stem_branch(p, pre + ".comb_iter_1_right", x, 7, 2))
    c2 = (avg_pool_excl(x1, 3, 2, 1) +
          _stem_branch(p, pre + ".comb_iter_2_right", x, 5, 2))
    c3 = avg_pool_excl(c0, 3, 1, 1) + c1
    c4 = (_branch_sep(p, pre + ".comb_iter_4_left", c0, 3, 1) +
          _maxpool_3_2_1(x1))
    return jnp.concatenate([c1, c2, c3, c4], axis=-1)


def _reduction_comb(p, pre, left, right):
    """Shared comb pattern of CellStem1 / ReductionCell0 / ReductionCell1:
    `left`/`right` are the operands the pool and separable branches see
    (cell-stem-1 swaps them relative to the reduction cells)."""
    c0 = (_branch_sep(p, pre + ".comb_iter_0_left", left, 5, 2, True) +
          _branch_sep(p, pre + ".comb_iter_0_right", right, 7, 2, True))
    c1 = (_max_pool_pad(left) +
          _branch_sep(p, pre + ".comb_iter_1_right", right, 7, 2, True))
    c2 = (_avg_pool_pad(left) +
          _branch_sep(p, pre + ".comb_iter_2_right", right, 5, 2, True))
    c3 = avg_pool_excl(c0, 3, 1, 1) + c1
    c4 = (_branch_sep(p, pre + ".comb_iter_4_left", c0, 3, 1, True) +
          _max_pool_pad(left))
    return jnp.concatenate([c1, c2, c3, c4], axis=-1)


def _cell_stem_1(p, pre, x_conv0, x_stem_0):
    x_left = _relu_conv_bn(p, pre + ".conv_1x1", x_stem_0)
    x_right = _shifted_paths(p, pre, x_conv0)
    return _reduction_comb(p, pre, x_left, x_right)


def _reduction_cell(p, pre, x, x_prev):
    x_left = _relu_conv_bn(p, pre + ".conv_prev_1x1", x_prev)
    x_right = _relu_conv_bn(p, pre + ".conv_1x1", x)
    return _reduction_comb(p, pre, x_right, x_left)


def _normal_comb(p, pre, x_left, x_right):
    c0 = (_branch_sep(p, pre + ".comb_iter_0_left", x_right, 5, 1) +
          _branch_sep(p, pre + ".comb_iter_0_right", x_left, 3, 1))
    c1 = (_branch_sep(p, pre + ".comb_iter_1_left", x_left, 5, 1) +
          _branch_sep(p, pre + ".comb_iter_1_right", x_left, 3, 1))
    c2 = avg_pool_excl(x_right, 3, 1, 1) + x_left
    c3 = avg_pool_excl(x_left, 3, 1, 1) + avg_pool_excl(x_left, 3, 1, 1)
    c4 = _branch_sep(p, pre + ".comb_iter_4_left", x_right, 3, 1) + x_right
    return jnp.concatenate([x_left, c0, c1, c2, c3, c4], axis=-1)


def _first_cell(p, pre, x, x_prev):
    x_left = _shifted_paths(p, pre, x_prev)
    x_right = _relu_conv_bn(p, pre + ".conv_1x1", x)
    return _normal_comb(p, pre, x_left, x_right)


def _normal_cell(p, pre, x, x_prev):
    x_left = _relu_conv_bn(p, pre + ".conv_prev_1x1", x_prev)
    x_right = _relu_conv_bn(p, pre + ".conv_1x1", x)
    return _normal_comb(p, pre, x_left, x_right)


def nasnet_reid_forward(p, images: jnp.ndarray,
                        variant: str = "nasnetamobile") -> jnp.ndarray:
    """images: [B, H, W, 3] normalized RGB NHWC -> [B, 1056] features."""
    del variant
    x_conv0 = bn(p, "conv0.bn", conv(p, "conv0.conv", images, stride=2),
                 eps=_EPS)
    x_stem_0 = _cell_stem_0(p, "cell_stem_0", x_conv0)
    x_stem_1 = _cell_stem_1(p, "cell_stem_1", x_conv0, x_stem_0)

    c0 = _first_cell(p, "cell_0", x_stem_1, x_stem_0)
    c1 = _normal_cell(p, "cell_1", c0, x_stem_1)
    c2 = _normal_cell(p, "cell_2", c1, c0)
    c3 = _normal_cell(p, "cell_3", c2, c1)

    r0 = _reduction_cell(p, "reduction_cell_0", c3, c2)

    c6 = _first_cell(p, "cell_6", r0, c3)
    c7 = _normal_cell(p, "cell_7", c6, r0)
    c8 = _normal_cell(p, "cell_8", c7, c6)
    c9 = _normal_cell(p, "cell_9", c8, c7)

    r1 = _reduction_cell(p, "reduction_cell_1", c9, c8)

    c12 = _first_cell(p, "cell_12", r1, c9)
    c13 = _normal_cell(p, "cell_13", c12, r1)
    c14 = _normal_cell(p, "cell_14", c13, c12)
    c15 = _normal_cell(p, "cell_15", c14, c13)

    return global_avg_pool(jax.nn.relu(c15)).astype(jnp.float32)
