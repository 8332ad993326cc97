"""Shape-static greedy NMS for TPU.

Replaces ``tf.image.non_max_suppression`` / ``combined_non_max_suppression``
(reference nn.py:1390, nn.py:1468, models.py:1211,1258-1304) with a fully
static masked formulation:

  1. sort candidates by score (stable, ties broken by lower index — same as
     TF's top_k tie-breaking, which downstream matching depends on);
  2. build the boolean suppression matrix ``m[j, i] = IOU(j, i) > thres`` for
     j earlier in score order than i;
  3. solve the greedy recurrence ``keep[i] = valid[i] & ~OR_j<i(keep[j] &
     m[j, i])`` by Jacobi fixpoint iteration — converges in O(longest
     suppression chain) steps (typically < 10), each step one [N, N] masked
     reduction on the VPU. This is exact greedy NMS, not an approximation.

Everything is padded: callers pass a validity mask and get back fixed-size
index/validity arrays, so the op jit-compiles once per shape.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou

_NEG_INF = -1e30


def _greedy_keep(boxes_sorted: jnp.ndarray, valid_sorted: jnp.ndarray,
                 iou_thres: float) -> jnp.ndarray:
    """Exact greedy-NMS keep vector over score-sorted boxes (see module doc)."""
    n = boxes_sorted.shape[0]
    iou = pairwise_iou(boxes_sorted, boxes_sorted)
    tri = jnp.tril(jnp.ones((n, n), jnp.bool_), k=-1).T  # m[j,i]: j < i
    suppress = (iou > iou_thres) & tri
    suppress = suppress & valid_sorted[:, None] & valid_sorted[None, :]

    def cond(state):
        keep, prev = state
        return jnp.any(keep != prev)

    def body(state):
        keep, _ = state
        new_keep = valid_sorted & ~jnp.any(suppress & keep[:, None], axis=0)
        return new_keep, keep

    init = (valid_sorted, jnp.zeros_like(valid_sorted))
    keep, _ = jax.lax.while_loop(cond, body, init)
    return keep


@partial(jax.jit, static_argnames=("max_out", "iou_thres"))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, max_out: int,
        iou_thres: float,
        valid: Optional[jnp.ndarray] = None,
        score_thres: Optional[float] = None,
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with static output size.

    Args:
      boxes: [N, 4] x1y1x2y2.
      scores: [N].
      max_out: static output count.
      iou_thres: suppression threshold (strict >, like TF).
      valid: optional [N] bool input-validity mask.
      score_thres: optional score filter applied before NMS (reference
        ``nms_return_masks`` score pre-filter, models.py:1205-1216).

    Returns:
      (indices [max_out] int32 into the *input* order, padded with -1;
       valid_out [max_out] bool). Selected boxes appear in descending score
      order, matching tf.image.non_max_suppression output order.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), jnp.bool_)
    if score_thres is not None:
        valid = valid & (scores > score_thres)

    masked_scores = jnp.where(valid, scores, _NEG_INF)
    order = jnp.argsort(-masked_scores, stable=True)
    boxes_s = boxes[order]
    valid_s = valid[order]

    keep = _greedy_keep(boxes_s, valid_s, iou_thres)

    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    sel = keep & (rank < max_out)
    out_idx = jnp.full((max_out,), -1, jnp.int32)
    out_valid = jnp.zeros((max_out,), jnp.bool_)
    write_pos = jnp.where(sel, rank, max_out)  # max_out rows are dropped
    out_idx = out_idx.at[write_pos].set(order.astype(jnp.int32), mode="drop")
    out_valid = out_valid.at[write_pos].set(True, mode="drop")
    return out_idx, out_valid


@partial(jax.jit, static_argnames=("max_out", "iou_thres", "use_score_thres"))
def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, max_out: int,
                iou_thres: float,
                valid: Optional[jnp.ndarray] = None,
                score_thres: Optional[jnp.ndarray] = None,
                use_score_thres: bool = False,
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vmapped NMS over a leading batch/class axis.

    boxes [B, N, 4], scores [B, N] -> (indices [B, max_out], valid [B, max_out]).
    """
    b, n = scores.shape
    if valid is None:
        valid = jnp.ones((b, n), jnp.bool_)
    if use_score_thres and score_thres is not None:
        valid = valid & (scores > score_thres)

    def one(bx, sc, va):
        return nms(bx, sc, max_out, iou_thres, valid=va)

    return jax.vmap(one)(boxes, scores, valid)


def nms_np(boxes, scores, max_out, iou_thres, score_thres=None):
    """Reference greedy NMS in numpy (for golden tests)."""
    import numpy as np
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    idxs = list(np.argsort(-scores, kind="stable"))
    if score_thres is not None:
        idxs = [i for i in idxs if scores[i] > score_thres]
    selected = []
    while idxs and len(selected) < max_out:
        i = idxs.pop(0)
        selected.append(i)
        rest = []
        for j in idxs:
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a_j = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            union = a_i + a_j - inter
            iou = inter / union if union > 0 else 0.0
            if not iou > iou_thres:
                rest.append(j)
        idxs = rest
    return selected
