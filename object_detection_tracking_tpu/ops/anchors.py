"""Anchor generation (host numpy; anchors are compile-time constants).

Reproduces the reference anchor numerics exactly — including the legacy
integer-rounding in the ratio enumeration and the ``+1`` on x2/y2 of the
dense field — because converted RPN weights were trained against these
boxes (reference: generate_anchors.py:42-110, utils.py:606-658).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def _whctrs(anchor: np.ndarray):
    w = anchor[2] - anchor[0] + 1
    h = anchor[3] - anchor[1] + 1
    x_ctr = anchor[0] + 0.5 * (w - 1)
    y_ctr = anchor[1] + 0.5 * (h - 1)
    return w, h, x_ctr, y_ctr


def _mkanchors(ws, hs, x_ctr, y_ctr):
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack([
        x_ctr - 0.5 * (ws - 1),
        y_ctr - 0.5 * (hs - 1),
        x_ctr + 0.5 * (ws - 1),
        y_ctr + 0.5 * (hs - 1),
    ])


def generate_base_anchors(base_size: int = 16,
                          ratios: Sequence[float] = (0.5, 1.0, 2.0),
                          scales: Sequence[float] = (8, 16, 32)) -> np.ndarray:
    """Anchors for one grid cell wrt a (0,0,base-1,base-1) window, layout
    NUM_RATIO x NUM_SCALE (generate_anchors.py:42-57)."""
    base_anchor = np.array([1, 1, base_size, base_size], np.float32) - 1
    w, h, x_ctr, y_ctr = _whctrs(base_anchor)
    size = w * h
    ratios = np.asarray(ratios, np.float64)
    size_ratios = size / ratios
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * ratios)
    ratio_anchors = _mkanchors(ws, hs, x_ctr, y_ctr)
    scales = np.asarray(scales, np.float64)
    out = []
    for i in range(ratio_anchors.shape[0]):
        w, h, x_ctr, y_ctr = _whctrs(ratio_anchors[i])
        out.append(_mkanchors(w * scales, h * scales, x_ctr, y_ctr))
    return np.vstack(out).astype(np.float32)


def get_all_anchors(stride: int, sizes: Sequence[float],
                    ratios: Sequence[float],
                    field_hw: Tuple[int, int]) -> np.ndarray:
    """Dense anchor field [FH, FW, A, 4] (x1y1x2y2 floatbox, x2/y2 exclusive
    via the legacy +1; utils.py:606-658).

    Unlike the reference (square ``max_size//stride`` field later sliced by
    the graph), this takes the static feature-map size directly — the TPU
    build compiles to a fixed padded image, so the field matches the feature
    map at build time and no slicing op exists in the graph.
    """
    cell_anchors = generate_base_anchors(
        base_size=stride,
        ratios=np.asarray(ratios, np.float64),
        scales=np.asarray(sizes, np.float64) / stride,
    )
    fh, fw = field_hw
    shift_x = np.arange(0, fw, dtype=np.float32) * stride
    shift_y = np.arange(0, fh, dtype=np.float32) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)          # [FH, FW]
    shifts = np.stack([sx, sy, sx, sy], axis=-1)    # [FH, FW, 4]
    A = cell_anchors.shape[0]
    field = shifts[:, :, None, :] + cell_anchors[None, None, :, :]
    field = field.astype(np.float32)
    field[:, :, :, [2, 3]] += 1.0
    assert field.shape == (fh, fw, A, 4)
    return field


def get_all_anchors_fpn(strides: Sequence[int], sizes: Sequence[float],
                        ratios: Sequence[float],
                        padded_hw: Tuple[int, int]):
    """Per-level dense anchor fields for an FPN pyramid over a static padded
    image (models.py:361-372). Level i field covers ceil(H/stride_i) cells.

    Returns list of [FH_i, FW_i, A, 4] arrays.
    """
    h, w = padded_hw
    out = []
    for stride, size in zip(strides, sizes):
        fh = int(np.ceil(h / stride))
        fw = int(np.ceil(w / stride))
        out.append(get_all_anchors(stride, [size], ratios, (fh, fw)))
    return out
