"""ROIAlign with exact ``tf.image.crop_and_resize`` fpcoor semantics.

The reference implements ROIAlign as: fpcoor box -> crop_and_resize at
2x the output size -> 2x2 average pool (nn.py:1229-1335). mAP parity and the
256-d tracking embeddings both depend on the exact sampling transform:

  sample coordinate for output pixel i of a crop of size S over box [y0, y1]:
      spacing = (y1 - y0) / S
      y(i) = y0 + spacing * (i + 0.5) - 0.5
  bilinear-interpolated; samples whose coordinate falls outside [0, H-1]
  produce 0 (TF extrapolation_value).

TPU-native design: instead of the reference's per-level dynamic partition
(models.py:446-487), all FPN levels are packed into one zero-padded
[L, Hmax, Wmax, C] buffer and every ROI does a single 4-neighbor gather from
the flat buffer with its level folded into the index — one gather kernel for
all ROIs, no dynamic shapes, no host sync.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _sample_grid(lo: jnp.ndarray, hi: jnp.ndarray, size: int) -> jnp.ndarray:
    """fpcoor sample coordinates along one axis. lo/hi: [N]. -> [N, size]."""
    spacing = (hi - lo) / size
    i = jnp.arange(size, dtype=jnp.float32)
    return lo[:, None] + spacing[:, None] * (i[None, :] + 0.5) - 0.5


def _bilinear_gather(flat_feat: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
                     h, w, row_offset, w_stride: int) -> jnp.ndarray:
    """Gather bilinear samples from a flattened [TOTAL_ROWS, C] buffer.

    A pixel (y, x) of the source map lives at row
    ``row_offset + y * w_stride + x`` (row_offset/h/w broadcast with iy/ix;
    h, w are the *valid* float extents used for the out-of-range rule).
    Returns [..., C] samples, 0 where the coordinate is out of range
    (TF crop_and_resize extrapolation_value).
    """
    in_range = (iy >= 0) & (iy <= h - 1) & (ix >= 0) & (ix <= w - 1)
    y0f = jnp.floor(iy)
    x0f = jnp.floor(ix)
    fy = iy - y0f
    fx = ix - x0f
    hi_y = (h - 1).astype(jnp.int32)
    hi_x = (w - 1).astype(jnp.int32)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, hi_y)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, hi_x)
    y1 = jnp.minimum(y0 + 1, hi_y)
    x1 = jnp.minimum(x0 + 1, hi_x)

    def flat(y, x):
        return row_offset + y * w_stride + x

    def g(idx):
        return jnp.take(flat_feat, idx.reshape(-1), axis=0).reshape(
            idx.shape + (flat_feat.shape[-1],))

    v00, v01, v10, v11 = g(flat(y0, x0)), g(flat(y0, x1)), \
        g(flat(y1, x0)), g(flat(y1, x1))
    wy = fy[..., None]
    wx = fx[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    return jnp.where(in_range[..., None], out, 0.0)


def crop_and_resize(feat: jnp.ndarray, boxes: jnp.ndarray,
                    crop_size: int,
                    valid_hw: Tuple = None) -> jnp.ndarray:
    """Exact TF crop_and_resize (fpcoor transform applied) for one feature map.

    feat: [H, W, C]; boxes: [N, 4] x1y1x2y2 in feature coords.
    valid_hw: optional (h, w) true extent (traced scalars ok) when feat is
      padded; out-of-range rule uses it.
    Returns [N, crop_size, crop_size, C].
    """
    H, W, C = feat.shape
    h = valid_hw[0] if valid_hw is not None else H
    w = valid_hw[1] if valid_hw is not None else W
    iy = _sample_grid(boxes[:, 1], boxes[:, 3], crop_size)  # [N, S]
    ix = _sample_grid(boxes[:, 0], boxes[:, 2], crop_size)  # [N, S]
    iy = jnp.broadcast_to(iy[:, :, None], (boxes.shape[0], crop_size, crop_size))
    ix = jnp.broadcast_to(ix[:, None, :], (boxes.shape[0], crop_size, crop_size))
    flat = feat.reshape(H * W, C)
    return _bilinear_gather(flat, iy, ix,
                            jnp.asarray(h, jnp.float32),
                            jnp.asarray(w, jnp.float32),
                            jnp.zeros((), jnp.int32), W)


def roi_align(feat: jnp.ndarray, boxes: jnp.ndarray,
              output_size: int, valid_hw=None) -> jnp.ndarray:
    """ROIAlign = crop_and_resize at 2x output then 2x2 avg pool
    (nn.py:1326-1335). feat [H, W, C], boxes [N, 4] feature-coord fpcoor.
    Returns [N, output_size, output_size, C]."""
    crop = crop_and_resize(feat, boxes, output_size * 2, valid_hw=valid_hw)
    n, s2, _, c = crop.shape
    s = s2 // 2
    crop = crop.reshape(n, s, 2, s, 2, c)
    return crop.mean(axis=(2, 4))


# --------------------------------------------------------------------------
# Multilevel (FPN) ROIAlign


def fpn_map_rois_to_levels(boxes: jnp.ndarray) -> jnp.ndarray:
    """FPN level id (0..3 for p2..p5) per ROI by sqrt-area heuristic
    (models.py:440-460). boxes: [N, 4] image-coord."""
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    sqrtarea = jnp.sqrt(jnp.maximum(area, 0.0))
    lvl = jnp.floor(4.0 + jnp.log(sqrtarea / 224.0 + 1e-6) / np.log(2.0))
    return jnp.clip(lvl.astype(jnp.int32), 2, 5) - 2


def pack_fpn_levels(features: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Pack per-level [H_l, W_l, C] maps into one zero-padded
    [L, Hmax, Wmax, C] buffer (level shapes are static)."""
    hmax = max(f.shape[0] for f in features)
    wmax = max(f.shape[1] for f in features)
    padded = [
        jnp.pad(f, ((0, hmax - f.shape[0]), (0, wmax - f.shape[1]), (0, 0)))
        for f in features
    ]
    return jnp.stack(padded, axis=0)


def multilevel_roi_align(features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                         strides: Sequence[int], output_size: int,
                         valid_hws=None, levels=None) -> jnp.ndarray:
    """FPN ROIAlign over packed levels with a single gather pass.

    features: list of [H_l, W_l, C] maps (p2..p5), image stride strides[l].
    boxes: [N, 4] image-coord x1y1x2y2 (may include padded/invalid rows —
      their output is garbage; callers carry a validity mask).
    valid_hws: optional list of (h_l, w_l) true extents (traced ok).
    Returns [N, output_size, output_size, C].
    """
    L = len(features)
    n = boxes.shape[0]
    C = features[0].shape[-1]
    packed = pack_fpn_levels(features)          # [L, Hmax, Wmax, C]
    _, hmax, wmax, _ = packed.shape
    flat = packed.reshape(L * hmax * wmax, C)

    if levels is None:
        lvl = fpn_map_rois_to_levels(boxes)     # [N] in 0..L-1
    else:
        lvl = levels.astype(jnp.int32)          # caller-provided source level
    lvl = jnp.clip(lvl, 0, L - 1)
    stride_arr = jnp.asarray(strides, jnp.float32)[lvl]   # [N]
    fboxes = boxes / stride_arr[:, None]

    size2 = output_size * 2
    iy = _sample_grid(fboxes[:, 1], fboxes[:, 3], size2)
    ix = _sample_grid(fboxes[:, 0], fboxes[:, 2], size2)
    iy = jnp.broadcast_to(iy[:, :, None], (n, size2, size2))
    ix = jnp.broadcast_to(ix[:, None, :], (n, size2, size2))

    if valid_hws is not None:
        hs = jnp.stack([jnp.asarray(h, jnp.float32) for h, _ in valid_hws])
        ws = jnp.stack([jnp.asarray(w, jnp.float32) for _, w in valid_hws])
    else:
        hs = jnp.asarray([f.shape[0] for f in features], jnp.float32)
        ws = jnp.asarray([f.shape[1] for f in features], jnp.float32)
    h_per_roi = hs[lvl][:, None, None]
    w_per_roi = ws[lvl][:, None, None]
    row_offset = (lvl * hmax)[:, None, None] * wmax  # folded level offset

    crop = _bilinear_gather(flat, iy, ix, h_per_roi, w_per_roi, row_offset,
                            wmax)
    crop = crop.reshape(n, output_size, 2, output_size, 2, C)
    return crop.mean(axis=(2, 4))


def crop_and_resize_np(feat, boxes, crop_size):
    """Numpy golden model of TF crop_and_resize + fpcoor transform."""
    feat = np.asarray(feat, np.float32)
    boxes = np.asarray(boxes, np.float32)
    H, W, C = feat.shape
    N = boxes.shape[0]
    out = np.zeros((N, crop_size, crop_size, C), np.float32)
    for ni in range(N):
        x0, y0, x1, y1 = boxes[ni]
        sw = (x1 - x0) / crop_size
        sh = (y1 - y0) / crop_size
        for i in range(crop_size):
            yy = y0 + sh * (i + 0.5) - 0.5
            for j in range(crop_size):
                xx = x0 + sw * (j + 0.5) - 0.5
                if yy < 0 or yy > H - 1 or xx < 0 or xx > W - 1:
                    continue
                yf, xf = int(np.floor(yy)), int(np.floor(xx))
                yc, xc = min(yf + 1, H - 1), min(xf + 1, W - 1)
                fy, fx = yy - yf, xx - xf
                top = feat[yf, xf] * (1 - fx) + feat[yf, xc] * fx
                bot = feat[yc, xf] * (1 - fx) + feat[yc, xc] * fx
                out[ni, i, j] = top * (1 - fy) + bot * fy
    return out
