"""Box utilities: IOU, encode/decode, clipping, resize geometry.

Numerics match the reference TF graph ops so converted weights reproduce
detections bit-for-bit:
  * decode/encode: nn.py:1486-1616 (center-offset + log-wh, decode clip)
  * clip_boxes:    nn.py:1339-1346 (clip x to W, y to H — not W-1/H-1)
  * pairwise_iou:  nn.py:675-700 (continuous area, no +1)
  * get_new_hw:    nn.py:1548-1560 (short-edge resize with max cap)

Every device function is shape-polymorphic under jit but expects static
shapes; numpy twins carry the ``_np`` suffix.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# IOU


def _pairwise_intersection(boxes1, boxes2, xp):
    """[N,4] x [M,4] -> [N,M] intersection areas (x1y1x2y2)."""
    x1 = xp.maximum(boxes1[:, None, 0], boxes2[None, :, 0])
    y1 = xp.maximum(boxes1[:, None, 1], boxes2[None, :, 1])
    x2 = xp.minimum(boxes1[:, None, 2], boxes2[None, :, 2])
    y2 = xp.minimum(boxes1[:, None, 3], boxes2[None, :, 3])
    w = xp.maximum(x2 - x1, 0.0)
    h = xp.maximum(y2 - y1, 0.0)
    return w * h


def _box_area(boxes, xp):
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IOU matrix [N, M] between two x1y1x2y2 box sets (device)."""
    inter = _pairwise_intersection(boxes1, boxes2, jnp)
    a1 = _box_area(boxes1, jnp)
    a2 = _box_area(boxes2, jnp)
    union = a1[:, None] + a2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def pairwise_iou_np(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    inter = _pairwise_intersection(
        np.asarray(boxes1, np.float64), np.asarray(boxes2, np.float64), np)
    a1 = _box_area(np.asarray(boxes1, np.float64), np)
    a2 = _box_area(np.asarray(boxes2, np.float64), np)
    union = a1[:, None] + a2[None, :] - inter
    out = np.zeros_like(inter)
    np.divide(inter, union, out=out, where=union > 0)
    return out


# --------------------------------------------------------------------------
# Encode / decode (Faster-RCNN box parameterization)


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray,
                 decode_clip: float) -> jnp.ndarray:
    """Apply (tx,ty,tw,th) deltas to x1y1x2y2 anchors. Shapes broadcast over
    leading dims; last dim is 4. Matches nn.py:1518-1541."""
    txy = deltas[..., 0:2]
    twh = deltas[..., 2:4]
    a_x1y1 = anchors[..., 0:2]
    a_x2y2 = anchors[..., 2:4]
    waha = a_x2y2 - a_x1y1
    xaya = (a_x2y2 + a_x1y1) * 0.5
    wbhb = jnp.exp(jnp.minimum(twh, decode_clip)) * waha
    xbyb = txy * waha + xaya
    x1y1 = xbyb - wbhb * 0.5
    x2y2 = xbyb + wbhb * 0.5
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def encode_boxes(target: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Inverse of decode_boxes (nn.py:1588-1616). target/anchors x1y1x2y2."""
    a_x1y1 = anchors[..., 0:2]
    a_x2y2 = anchors[..., 2:4]
    waha = a_x2y2 - a_x1y1
    xaya = (a_x2y2 + a_x1y1) * 0.5
    t_x1y1 = target[..., 0:2]
    t_x2y2 = target[..., 2:4]
    wghg = t_x2y2 - t_x1y1
    xgyg = (t_x2y2 + t_x1y1) * 0.5
    txy = (xgyg - xaya) / waha
    twh = jnp.log(wghg / waha)
    return jnp.concatenate([txy, twh], axis=-1)


def decode_boxes_np(deltas, anchors, decode_clip):
    deltas = np.asarray(deltas, np.float32)
    anchors = np.asarray(anchors, np.float32)
    waha = anchors[..., 2:4] - anchors[..., 0:2]
    xaya = (anchors[..., 2:4] + anchors[..., 0:2]) * 0.5
    wbhb = np.exp(np.minimum(deltas[..., 2:4], decode_clip)) * waha
    xbyb = deltas[..., 0:2] * waha + xaya
    return np.concatenate([xbyb - wbhb * 0.5, xbyb + wbhb * 0.5], axis=-1)


# --------------------------------------------------------------------------
# Clipping


def clip_boxes(boxes: jnp.ndarray, hw) -> jnp.ndarray:
    """Clip x1y1x2y2 boxes into [0,W]x[0,H]. hw = (H, W) scalars (may be
    traced). Matches nn.py:1339-1346."""
    h, w = hw[0], hw[1]
    lo = jnp.zeros((4,), boxes.dtype)
    hi = jnp.stack([w, h, w, h]).astype(boxes.dtype)
    return jnp.minimum(jnp.maximum(boxes, lo), hi)


# --------------------------------------------------------------------------
# Host resize geometry


def get_new_hw(h: int, w: int, size: int, max_size: int) -> Tuple[int, int]:
    """Short-edge target resize with long-edge cap; returns (new_w, new_h)
    like the reference (nn.py:1548-1560)."""
    scale = size * 1.0 / min(h, w)
    if h < w:
        newh, neww = size, scale * w
    else:
        newh, neww = scale * h, size
    if max(newh, neww) > max_size:
        scale = max_size * 1.0 / max(newh, neww)
        newh = newh * scale
        neww = neww * scale
    return int(neww + 0.5), int(newh + 0.5)


# --------------------------------------------------------------------------
# Format conversions (tracker interop; host numpy)


def xyxy_to_tlwh(boxes: np.ndarray) -> np.ndarray:
    boxes = np.asarray(boxes, np.float32).copy()
    boxes[..., 2] -= boxes[..., 0]
    boxes[..., 3] -= boxes[..., 1]
    return boxes


def tlwh_to_xyxy(boxes: np.ndarray) -> np.ndarray:
    boxes = np.asarray(boxes, np.float32).copy()
    boxes[..., 2] += boxes[..., 0]
    boxes[..., 3] += boxes[..., 1]
    return boxes


def tlwh_to_xyah(boxes: np.ndarray) -> np.ndarray:
    """top-left-wh -> center-x, center-y, aspect(w/h), height."""
    boxes = np.asarray(boxes, np.float32).copy()
    out = boxes.copy()
    out[..., 0] = boxes[..., 0] + boxes[..., 2] / 2.0
    out[..., 1] = boxes[..., 1] + boxes[..., 3] / 2.0
    out[..., 2] = boxes[..., 2] / np.maximum(boxes[..., 3], 1e-6)
    out[..., 3] = boxes[..., 3]
    return out
