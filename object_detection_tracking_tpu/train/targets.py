"""On-device training-target assignment (static shapes).

The reference computes RPN anchor labels on the host per image in numpy
(models.py:3380-3486, ~250k-anchor IOU per image inside the feed_dict path —
a known CPU hot loop, SURVEY.md §3.3) and samples proposal targets in-graph
with dynamic shapes (nn.py:1119-1176). Here both run on the TPU with padded
shapes, so the input pipeline ships only raw boxes.

Rules preserved:
  * anchors outside the (unpadded) image are ignored (filter_box_inside);
  * positive: IOU >= pos_thres, plus every anchor that attains a gt's max
    IOU; negative: max IOU < neg_thres; rest ignored (-1);
  * random subsample to rpn_batch_per_im with fg_ratio cap;
  * proposal sampling: gt boxes appended as proposals, fg iff max IOU >=
    fg_thres, random fg/bg subsample to fastrcnn_batch_per_im.

Static-shape deviation: fg/bg slots have fixed caps (batch*fg_ratio /
batch*(1-fg_ratio)); the reference tops up bg when fg is short. Padded
slots carry valid=False and drop out of every loss term.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import pairwise_iou

NEG = -1e30


def _random_cap_mask(rng, mask: jnp.ndarray, cap) -> jnp.ndarray:
    """Keep at most ``cap`` True entries of ``mask``, chosen uniformly.
    cap may be traced. Returns the thinned mask."""
    n = mask.shape[0]
    r = jax.random.uniform(rng, (n,))
    score = jnp.where(mask, r, NEG)
    order = jnp.argsort(-score)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return mask & (rank < cap)


def anchor_targets(rng, all_anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                   gt_valid: jnp.ndarray, image_hw: Tuple[int, int],
                   rpn_batch_per_im: int = 256, fg_ratio: float = 0.5,
                   pos_thres: float = 0.7, neg_thres: float = 0.3):
    """Label a flat anchor set against padded gt.

    all_anchors [NA, 4] (compile-time constant), gt_boxes [G, 4] x1y1x2y2
    (padded rows arbitrary), gt_valid [G] bool.
    Returns labels [NA] in {-1, 0, 1} and target gt boxes [NA, 4]
    (zeros for non-fg)."""
    h, w = image_hw
    inside = ((all_anchors[:, 0] >= 0) & (all_anchors[:, 1] >= 0) &
              (all_anchors[:, 2] <= w) & (all_anchors[:, 3] <= h))

    iou = pairwise_iou(all_anchors, gt_boxes)            # [NA, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    iou = jnp.where(inside[:, None], iou, -1.0)

    iou_max = iou.max(axis=1)
    iou_argmax = iou.argmax(axis=1)

    # anchors attaining each gt's best IOU (ties included, like np.where ==)
    iou_max_per_gt = iou.max(axis=0, keepdims=True)      # [1, G]
    is_best_for_some_gt = jnp.any(
        (iou == iou_max_per_gt) & gt_valid[None, :] & (iou > 0), axis=1)

    labels = jnp.full((all_anchors.shape[0],), -1, jnp.int32)
    labels = jnp.where(iou_max < neg_thres, 0, labels)
    labels = jnp.where(is_best_for_some_gt | (iou_max >= pos_thres), 1, labels)
    labels = jnp.where(inside, labels, -1)

    rng_fg, rng_bg = jax.random.split(rng)
    target_fg = int(rpn_batch_per_im * fg_ratio)
    fg_mask = _random_cap_mask(rng_fg, labels == 1, target_fg)
    num_fg = fg_mask.sum()
    bg_mask = _random_cap_mask(rng_bg, labels == 0,
                               rpn_batch_per_im - num_fg)
    labels = jnp.where(labels == 1, jnp.where(fg_mask, 1, -1), labels)
    labels = jnp.where(labels == 0, jnp.where(bg_mask, 0, -1), labels)

    target_boxes = jnp.where(
        (labels == 1)[:, None], gt_boxes[iou_argmax], 0.0)
    return labels, target_boxes


def sample_fastrcnn_targets(rng, proposals: jnp.ndarray,
                            prop_valid: jnp.ndarray, gt_boxes: jnp.ndarray,
                            gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                            batch_per_im: int = 512, fg_ratio: float = 0.25,
                            fg_thres: float = 0.5):
    """Sample padded RoI training targets (nn.py:1119-1176, static shapes).

    Returns dict with boxes [S, 4], labels [S] (0 = bg), fg_gt_boxes [S, 4],
    valid [S], fg [S]; S = batch_per_im.
    """
    boxes = jnp.concatenate([proposals, gt_boxes], axis=0)      # [K+G, 4]
    valid = jnp.concatenate([prop_valid, gt_valid], axis=0)
    iou = pairwise_iou(boxes, gt_boxes)                          # [K+G, G]
    g = gt_boxes.shape[0]
    k = proposals.shape[0]
    eye = jnp.eye(g, dtype=iou.dtype)
    iou = iou.at[k:, :].set(eye)                                 # gt rows
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    iou = jnp.where(valid[:, None], iou, -1.0)

    iou_max = iou.max(axis=1)
    best_gt = iou.argmax(axis=1)
    fg_mask = (iou_max >= fg_thres) & valid
    bg_mask = (~fg_mask) & valid & (iou_max >= 0)

    n_cand = boxes.shape[0]
    fg_cap = min(int(batch_per_im * fg_ratio), n_cand)
    bg_cap = min(batch_per_im - fg_cap, n_cand)
    rng_fg, rng_bg = jax.random.split(rng)

    def select(rng_, mask, cap):
        r = jax.random.uniform(rng_, mask.shape)
        score = jnp.where(mask, r, NEG)
        vals, idx = jax.lax.top_k(score, cap)
        return idx, vals > NEG / 2

    fg_idx, fg_ok = select(rng_fg, fg_mask, fg_cap)
    bg_idx, bg_ok = select(rng_bg, bg_mask, bg_cap)

    sel_idx = jnp.concatenate([fg_idx, bg_idx])
    sel_ok = jnp.concatenate([fg_ok, bg_ok])
    sel_fg = jnp.concatenate(
        [fg_ok, jnp.zeros_like(bg_ok)])

    sel_boxes = jnp.where(sel_ok[:, None], boxes[sel_idx], 0.0)
    sel_gt = best_gt[sel_idx]
    labels = jnp.where(
        sel_fg, gt_labels[sel_gt].astype(jnp.int32), 0)
    labels = jnp.where(sel_ok, labels, 0)
    fg_gt_boxes = jnp.where(sel_fg[:, None], gt_boxes[sel_gt], 0.0)

    return {
        "boxes": sel_boxes,
        "labels": labels,
        "valid": sel_ok,
        "fg": sel_fg,
        "fg_gt_boxes": fg_gt_boxes,
        # index of the matched gt for fg rows (0 for non-fg) — the mask
        # head gathers its 28x28 targets with this
        # (fg rows are packed first: rows [0, batch*fg_ratio) are fg slots)
        "fg_gt_idx": jnp.where(sel_fg, sel_gt, 0).astype(jnp.int32),
    }


def effdet_anchor_targets(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                          gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                          match_threshold: float = 0.5):
    """EfficientDet AnchorLabeler (reference efficientdet/anchors.py:540:
    ArgMax matcher with match == unmatched threshold, so there is no
    ignore band, plus force_match_for_each_row: every valid gt claims its
    best anchor even below threshold).

    anchors [N, 4] x1y1x2y2 (static), gt_* padded with gt_valid [G].
    Returns (cls_targets [N] int32 — 0 = background, else the gt label;
    box_targets [N, 4] (ty, tx, th, tw); fg [N] bool)."""
    from ..models.efficientdet.anchors import encode_effdet_boxes

    iou = pairwise_iou(anchors, gt_boxes)                # [N, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    iou_max = iou.max(axis=1)
    iou_argmax = iou.argmax(axis=1)

    # force match: gt g's best anchor becomes positive for g, overriding
    # that anchor's argmax assignment (ArgMaxMatcher force_match rows)
    best_anchor_per_gt = iou.argmax(axis=0)              # [G]
    n = anchors.shape[0]
    forced_gt = jnp.full((n,), -1, jnp.int32)
    forced_gt = forced_gt.at[best_anchor_per_gt].set(
        jnp.where(gt_valid, jnp.arange(gt_boxes.shape[0], dtype=jnp.int32),
                  -1))
    matched_gt = jnp.where(forced_gt >= 0, forced_gt, iou_argmax)
    fg = (forced_gt >= 0) | (iou_max >= match_threshold)

    cls_targets = jnp.where(fg, gt_labels[matched_gt], 0).astype(jnp.int32)
    box_targets = jnp.where(
        fg[:, None], encode_effdet_boxes(gt_boxes[matched_gt], anchors), 0.0)
    return cls_targets, box_targets, fg
