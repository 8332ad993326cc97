"""Detection losses (masked static-shape versions of models.py:1328-1466).

All reductions use validity masks instead of boolean_mask gathers; the
normalizers match the reference exactly (sum/rpn_batch_per_im for RPN,
mean-over-samples for the FRCNN label loss, sum/num_samples for its box
loss; huber delta 1/9 with the reference's ``/delta`` rescale for RPN).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.boxes import encode_boxes


def huber(diff: jnp.ndarray, delta: float) -> jnp.ndarray:
    abs_d = jnp.abs(diff)
    quad = 0.5 * diff * diff
    lin = delta * (abs_d - 0.5 * delta)
    return jnp.where(abs_d <= delta, quad, lin)


def sigmoid_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return logz - picked


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
               alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """Per-element sigmoid focal loss (nn.py:1621-1640; sum over the last
    axes is the caller's job). labels are {0, 1} floats."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    pos_sub = jnp.where(labels > 0, labels - p, 0.0)
    neg_sub = jnp.where(labels > 0, 0.0, p)
    return (-alpha * (pos_sub ** gamma) *
            jnp.log(jnp.clip(p, 1e-8, 1.0)) -
            (1 - alpha) * (neg_sub ** gamma) *
            jnp.log(jnp.clip(1.0 - p, 1e-8, 1.0)))


def rpn_losses(anchor_labels: jnp.ndarray, anchor_boxes: jnp.ndarray,
               anchors: jnp.ndarray, label_logits: jnp.ndarray,
               box_logits: jnp.ndarray,
               rpn_batch_per_im: int = 256,
               use_focal: bool = False) -> Dict[str, jnp.ndarray]:
    """One level. anchor_labels [N] {-1,0,1}; anchor_boxes [N, 4] target gt
    boxes (fg rows); anchors [N, 4]; logits [N] / [N, 4]."""
    valid = anchor_labels != -1
    pos = anchor_labels == 1

    if use_focal:
        lbl = focal_loss(label_logits.astype(jnp.float32),
                         (anchor_labels == 1).astype(jnp.float32))
        label_loss = jnp.where(valid, lbl, 0.0).sum()
    else:
        lbl = sigmoid_ce(label_logits.astype(jnp.float32),
                         (anchor_labels == 1).astype(jnp.float32))
        label_loss = jnp.where(valid, lbl, 0.0).sum() / rpn_batch_per_im

    enc_gt = encode_boxes(anchor_boxes, anchors)
    delta = 1.0 / 9
    bl = huber(box_logits.astype(jnp.float32) - enc_gt, delta)
    box_loss = jnp.where(pos[:, None], bl, 0.0).sum() / delta / \
        rpn_batch_per_im

    nr_valid = valid.sum()
    nr_pos = pos.sum()
    return {
        "rpn_label_loss": jnp.where(nr_valid == 0, 0.0, label_loss),
        "rpn_box_loss": jnp.where(nr_pos == 0, 0.0, box_loss),
    }


def fastrcnn_losses(labels: jnp.ndarray, label_logits: jnp.ndarray,
                    enc_fg_boxes: jnp.ndarray, box_logits: jnp.ndarray,
                    valid: jnp.ndarray, fg: jnp.ndarray,
                    use_focal: bool = False) -> Dict[str, jnp.ndarray]:
    """labels [S] (0 bg), label_logits [S, C], enc_fg_boxes [S, 4] encoded
    regression targets for fg rows, box_logits [S, num_box_class, 4], masks
    valid/fg [S]."""
    n_valid = jnp.maximum(valid.sum(), 1)
    if use_focal:
        onehot = jax.nn.one_hot(labels, label_logits.shape[-1])
        fl = focal_loss(label_logits.astype(jnp.float32), onehot).sum(-1)
        label_loss = jnp.where(valid, fl, 0.0).sum()
    else:
        ce = softmax_ce(label_logits.astype(jnp.float32), labels)
        label_loss = jnp.where(valid, ce, 0.0).sum() / n_valid

    if box_logits.shape[1] > 1:
        cls_idx = jnp.maximum(labels - 1, 0)
        fg_box_logits = jnp.take_along_axis(
            box_logits, cls_idx[:, None, None], axis=1)[:, 0, :]
    else:
        fg_box_logits = box_logits[:, 0, :]
    bl = huber(fg_box_logits.astype(jnp.float32) - enc_fg_boxes, 1.0)
    box_loss = jnp.where(fg[:, None], bl, 0.0).sum() / n_valid
    return {"frcnn_label_loss": label_loss, "frcnn_box_loss": box_loss}


def crop_mask_to_roi(gt_mask: jnp.ndarray, gt_box: jnp.ndarray,
                     roi_box: jnp.ndarray, out_size: int = 28
                     ) -> jnp.ndarray:
    """Resample a box-local gt mask onto an roi box's 28x28 grid.

    The reference crops full-image rasterized gt masks to each fg proposal
    with crop_and_resize (models.py:744-776). TPU-static equivalent: gt
    masks arrive pre-rasterized on a fixed Ms x Ms grid covering their OWN
    gt box; here we bilinearly sample that grid at the roi box's 28x28
    pixel centers (image coords mapped through the gt box extent).

    gt_mask [Ms, Ms] float {0,1}; gt_box, roi_box [4] x1y1x2y2 image
    coords. Returns [out, out] float in [0, 1]."""
    ms = gt_mask.shape[0]
    gx1, gy1, gx2, gy2 = gt_box[0], gt_box[1], gt_box[2], gt_box[3]
    rx1, ry1, rx2, ry2 = roi_box[0], roi_box[1], roi_box[2], roi_box[3]
    gw = jnp.maximum(gx2 - gx1, 1e-4)
    gh = jnp.maximum(gy2 - gy1, 1e-4)
    # image coords of the roi's output pixel centers
    ys = ry1 + (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * \
        (ry2 - ry1) / out_size
    xs = rx1 + (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * \
        (rx2 - rx1) / out_size
    # -> continuous gt-mask pixel coords (pixel-center convention)
    u = (ys - gy1) / gh * ms - 0.5
    v = (xs - gx1) / gw * ms - 0.5

    def sample_axis(c):
        c0 = jnp.floor(c)
        frac = c - c0
        i0 = jnp.clip(c0.astype(jnp.int32), 0, ms - 1)
        i1 = jnp.clip(i0 + 1, 0, ms - 1)
        # points outside the gt box are background
        inb = (c > -0.5 - 1e-6) & (c < ms - 0.5 + 1e-6)
        return i0, i1, frac, inb

    y0, y1, fy, in_y = sample_axis(u)
    x0, x1, fx, in_x = sample_axis(v)
    m = gt_mask.astype(jnp.float32)
    top = m[y0][:, x0] * (1 - fx)[None, :] + m[y0][:, x1] * fx[None, :]
    bot = m[y1][:, x0] * (1 - fx)[None, :] + m[y1][:, x1] * fx[None, :]
    out = top * (1 - fy)[:, None] + bot * fy[:, None]
    return jnp.where(in_y[:, None] & in_x[None, :], out, 0.0)


def maskrcnn_loss(mask_logits: jnp.ndarray, labels: jnp.ndarray,
                  fg: jnp.ndarray, mask_targets: jnp.ndarray
                  ) -> jnp.ndarray:
    """Mask head loss (models.py:1307-1326): per-class channel gathered by
    the fg row's label, mean per-pixel sigmoid CE over fg rows.

    mask_logits [S, 28, 28, C-1]; labels [S] (1..C-1 on fg rows); fg [S];
    mask_targets [S, 28, 28] float {0,1} (only fg rows matter)."""
    cls_idx = jnp.clip(labels - 1, 0, mask_logits.shape[-1] - 1)
    picked = jnp.take_along_axis(
        mask_logits, cls_idx[:, None, None, None], axis=-1)[..., 0]
    ce = sigmoid_ce(picked.astype(jnp.float32),
                    mask_targets.astype(jnp.float32))
    per_roi = ce.mean(axis=(1, 2))
    n_fg = jnp.maximum(fg.sum(), 1)
    loss = jnp.where(fg, per_roi, 0.0).sum() / n_fg
    return jnp.where(fg.any(), loss, 0.0)
