"""Faster/Mask-RCNN-FPN detector — one jit-compiled forward, static shapes.

TPU-first redesign of the reference Mask_RCNN_FPN graph (models.py:266-1812):

  * Every shape is static. The image size (h, w) is a compile-time constant
    (one XLA executable per video resolution); proposals and detections are
    fixed-size padded arrays with validity masks — the reference's own
    batched path already works this way (final_valid_indices,
    models.py:2329-2336), we make it universal.
  * NHWC + bf16 compute on the MXU; parameters stay f32.
  * NMS is the exact greedy solution computed by Jacobi fixpoint
    (ops/nms.py); ROIAlign is a single packed-level gather (ops/roi_align.py)
    with the exact crop_and_resize fpcoor transform.
  * Batched inference is `vmap` of the per-image tail over a natively
    batched backbone — no separate "multi" model class (replaces
    Mask_RCNN_FPN_multi, models.py:1969-3486).
  * Pad-region anchors are masked out with compile-time masks instead of the
    reference's dynamic feature slicing (models.py:372-400).

Outputs per image (R = config.result_per_im):
  final_boxes [R, 4] x1y1x2y2 (image coords), final_labels [R] int32 (>=1),
  final_probs [R], final_valid [R] bool, fpn_box_feat [R, 7, 7, 256]
  (+ final_masks [R, 28, 28] if add_mask).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetectorConfig
from ..ops import anchors as anchor_lib
from ..ops.boxes import clip_boxes, decode_boxes
from ..ops.nms import nms
from ..ops.roi_align import multilevel_roi_align, roi_align
from . import heads as heads_lib
from .fpn import fpn_model, init_fpn, init_rpn_head, rpn_head
from .resnet import init_resnet, resnet_c2345

# ImageNet BGR mean/std (the host feeds cv2 BGR frames; models.py:340-352)
_BGR_MEAN = np.array([0.406, 0.456, 0.485], np.float32)
_BGR_STD = np.array([0.225, 0.224, 0.229], np.float32)


def _round_up(x: int, m: int) -> int:
    return int(math.ceil(x / m) * m)


class FasterRCNNFPN:
    """Stateless model object: holds config + init/apply functions."""

    def __init__(self, config: DetectorConfig, keep_full_box_feat: bool = True):
        self.config = config
        self.keep_full_box_feat = keep_full_box_feat
        cfg = config
        if cfg.use_basic_block:
            self.c_channels = (64, 128, 256, 512)
        elif cfg.use_resnext:
            self.c_channels = (256, 512, 1024, 2048)
        else:
            self.c_channels = (256, 512, 1024, 2048)
        # partial-class gather indices (static; models.py:805-829)
        if cfg.partial_classes:
            full = dict(
                __import__(
                    "object_detection_tracking_tpu.class_ids",
                    fromlist=["coco_obj_class_to_id"]).coco_obj_class_to_id)
            ids = [full[name] for name in cfg.partial_classes]
            self.partial_label_idx = np.array([0] + ids, np.int64)
            self.partial_box_idx = np.array([i - 1 for i in ids], np.int64)
            self.num_out_class = len(ids) + 1
        else:
            self.partial_label_idx = None
            self.partial_box_idx = None
            self.num_out_class = cfg.num_class

    # ------------------------------------------------------------------
    # params

    def init_params(self, rng) -> Dict:
        cfg = self.config
        r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
        params = {
            "resnet": init_resnet(r1, cfg.resnet_num_block,
                                  cfg.use_basic_block,
                                  use_se=cfg.use_se,
                                  use_resnext=cfg.use_resnext,
                                  use_deformable=cfg.use_deformable),
            "fpn": init_fpn(r2, self.c_channels, cfg.fpn_num_channel,
                            use_gn=cfg.use_gn),
            "rpn": init_rpn_head(r3, cfg.fpn_num_channel,
                                 cfg.num_anchors_per_cell),
            "fastrcnn": heads_lib.init_fastrcnn_2fc_head(
                r4, cfg.num_class, cfg.fpn_num_channel, 7,
                cfg.fpn_frcnn_fc_head_dim, cfg.use_frcnn_class_agnostic,
                add_relation_nn=cfg.add_relation_nn,
                use_att_head=cfg.use_att_frcnn_head,
                use_conv_head=cfg.use_conv_frcnn_head,
                conv_dim=cfg.conv_frcnn_head_dim),
        }
        if cfg.add_mask:
            params["maskrcnn"] = heads_lib.init_maskrcnn_head(
                r5, cfg.num_class, cfg.fpn_num_channel, cfg.mrcnn_head_dim)
        if cfg.use_small_object_head:
            from .layers import init_dense
            from .relation import init_relation
            so_names = [n for n in cfg.small_objects
                        if n in cfg.classname2id]
            rs = jax.random.split(jax.random.fold_in(rng, 99),
                                  len(so_names) + 1)
            so: Dict = {}
            for i in range(len(so_names)):
                so[f"small_object_classification_c{i + 1}"] = init_dense(
                    rs[i], cfg.fpn_frcnn_fc_head_dim, 2, "normal", 0.01)
            if cfg.use_so_association:
                so["person_object_relation"] = init_relation(
                    rs[-1], cfg.fpn_frcnn_fc_head_dim)
            params["small_objects"] = so
        return params

    # ------------------------------------------------------------------
    # static geometry helpers

    def _static_geometry(self, h: int, w: int):
        """Anchor fields + pad-region validity masks for an (h, w) image
        (all numpy compile-time constants)."""
        cfg = self.config
        hp = _round_up(h, cfg.fpn_resolution_requirement)
        wp = _round_up(w, cfg.fpn_resolution_requirement)
        fields = []
        valids = []
        for li, stride in enumerate(cfg.anchor_strides):
            if li < 4:
                fh, fw = hp // stride, wp // stride
            else:  # p6 from stride-2 subsample of p5
                fh = -(-(hp // 32) // 2)
                fw = -(-(wp // 32) // 2)
            field = anchor_lib.get_all_anchors(
                stride, [cfg.anchor_sizes[li]], cfg.anchor_ratios, (fh, fw))
            # reference slices p2..p4 features+anchors to ceil(true/stride)
            # (models.py:372-400); p5/p6 extents already match. We mask.
            vh = min(fh, -(-h // stride))
            vw = min(fw, -(-w // stride))
            valid = np.zeros((fh, fw, len(cfg.anchor_ratios)), bool)
            valid[:vh, :vw, :] = True
            fields.append(field)
            valids.append(valid)
        return hp, wp, fields, valids

    # ------------------------------------------------------------------
    # forward pieces

    @staticmethod
    def i420_to_bgr(images: jnp.ndarray) -> jnp.ndarray:
        """[B, 3h/2, w] planar YUV420 uint8 -> [B, h, w, 3] BGR float
        (0-255). Matches cv2.COLOR_YUV2BGR_I420 to <=1 LSB: BT.601 video
        range with nearest chroma upsampling (fitted empirically against
        cv2 5.0)."""
        b, h15, w = images.shape
        h = h15 * 2 // 3
        x = images.astype(jnp.float32)
        y = x[:, :h, :]
        u = x[:, h:h + h // 4, :].reshape(b, h // 2, w // 2)
        v = x[:, h + h // 4:, :].reshape(b, h // 2, w // 2)

        def up2(p):
            return jnp.repeat(jnp.repeat(p, 2, axis=1), 2, axis=2)

        u = up2(u) - 128.0
        v = up2(v) - 128.0
        yy = 1.164 * (y - 16.0)
        bch = yy + 2.018 * u
        g = yy - 0.391 * u - 0.813 * v
        r = yy + 1.596 * v
        bgr = jnp.stack([bch, g, r], axis=-1)
        # emulate cv2's uint8 quantization so downstream normalization
        # matches the reference BGR path bit-for-bit (within 1 LSB)
        return jnp.round(jnp.clip(bgr, 0.0, 255.0))

    def _i420_s2d_normalized(self, images: jnp.ndarray, hp: int,
                             wp: int) -> jnp.ndarray:
        """Fused I420 -> normalized space-to-depth stem input.

        The 2x2 space-to-depth cell coincides exactly with I420's chroma
        block (one U/V pair per 2x2 luma block, nearest upsampling), so
        the conversion never materializes the [B, h, w, 3] full-res BGR
        image: each of the four cell positions gets its BGR from a
        strided luma slice plus the SHARED half-res chroma planes, all at
        [B, h/2, w/2] — profiling showed the unfused path (f32 BGR then
        relayout) cost ~3 ms/batch in pure layout copies at 8x720p.
        Values bit-identical to i420_to_bgr -> s2d -> normalize (same
        BT.601 math and cv2 quantization, same [dy, dx, BGR] channel
        order)."""
        cfg = self.config
        b, h15, w = images.shape
        h = h15 * 2 // 3
        hh, hw = h // 2, w // 2
        # ONE uint8 relayout up front: even/odd row+column deinterleave.
        # (The lane-dim strided-slice formulation y[:, dy::2, dx::2] is a
        # per-channel lane shuffle and measured no faster than the
        # unfused path; a single transpose keeps all the math on
        # [.., hh, hw] slabs with the image width in the vector lanes.)
        ys2d = images[:, :h, :].reshape(b, hh, 2, hw, 2)
        ys2d = ys2d.transpose(0, 2, 4, 1, 3)           # [b, 2, 2, hh, hw]
        yy = 1.164 * (ys2d.astype(jnp.float32) - 16.0)
        # chroma planes are shared by all four cell positions (nearest
        # upsampling == the s2d cell structure); broadcast over (dy, dx)
        u = images[:, h:h + h // 4, :].reshape(b, 1, 1, hh, hw)
        v = images[:, h + h // 4:, :].reshape(b, 1, 1, hh, hw)
        u = u.astype(jnp.float32) - 128.0
        v = v.astype(jnp.float32) - 128.0
        mean = np.asarray(_BGR_MEAN).reshape(-1)
        std = np.asarray(_BGR_STD).reshape(-1)
        chans = []
        for ci, bgr in enumerate((yy + 2.018 * u,
                                  yy - 0.391 * u - 0.813 * v,
                                  yy + 1.596 * v)):
            q = jnp.round(jnp.clip(bgr, 0.0, 255.0))
            chans.append((q * (1.0 / 255.0) - mean[ci]) / std[ci])
        out = jnp.stack(chans, axis=3)            # [b, 2, 2, 3, hh, hw]
        out = out.astype(jnp.dtype(cfg.compute_dtype))
        # one output relayout to the stem's [b, hh, hw, (dy, dx, BGR)]
        out = out.transpose(0, 4, 5, 1, 2, 3).reshape(b, hh, hw, 12)
        return jnp.pad(out, ((0, 0), (0, (hp - h) // 2),
                             (0, (wp - w) // 2), (0, 0)))

    def preprocess(self, images: jnp.ndarray, hp: int, wp: int,
                   s2d: bool = False) -> jnp.ndarray:
        """[B, h, w, 3] BGR uint8/float (or [B, 3h/2, w] planar I420) ->
        padded normalized [B, hp, wp, 3] in compute dtype
        (models.py:322-357 + backbone pad-to-multiple).

        s2d=True emits the 2x2 space-to-depth layout [B, hp/2, wp/2, 12]
        the stem conv consumes directly: the relayout happens on the raw
        (uint8) pixels BEFORE the f32 normalize, which XLA then fuses —
        profiling showed the post-normalize bf16 relayout cost 3.0 ms of
        pure layout copies per 8x736x1280 batch. Bit-identical values
        (transpose commutes with the elementwise normalize; zero padding
        unchanged). Falls back to the flat layout on odd extents."""
        cfg = self.config
        if images.ndim == 3 and s2d:
            b, h15, w = images.shape
            h = h15 * 2 // 3
            if h % 2 == 0 and w % 2 == 0:
                return self._i420_s2d_normalized(images, hp, wp)
        if images.ndim == 3:
            images = self.i420_to_bgr(images)
        h, w = images.shape[1:3]
        if s2d and h % 2 == 0 and w % 2 == 0 and images.shape[-1] == 3:
            b = images.shape[0]
            x = images.reshape(b, h // 2, 2, w // 2, 2, 3)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 12)
            x = x.astype(jnp.float32) * (1.0 / 255.0)
            x = (x - jnp.tile(_BGR_MEAN, 4)) / jnp.tile(_BGR_STD, 4)
            x = jnp.pad(x, ((0, 0), (0, (hp - h) // 2),
                            (0, (wp - w) // 2), (0, 0)))
            return x.astype(jnp.dtype(cfg.compute_dtype))
        x = images.astype(jnp.float32) * (1.0 / 255.0)
        x = (x - _BGR_MEAN) / _BGR_STD
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        return x.astype(jnp.dtype(cfg.compute_dtype))

    def backbone(self, params, p_images: jnp.ndarray) -> List[jnp.ndarray]:
        cfg = self.config
        c2345 = resnet_c2345(
            params["resnet"], p_images, cfg.resnet_num_block,
            use_basic_block=cfg.use_basic_block,
            use_dilations=cfg.use_dilations,
            use_se=cfg.use_se, use_resnext=cfg.use_resnext,
            freeze=cfg.freeze if cfg.is_train else -1,
            fused_stages=(cfg.backbone_impl == "pallas"
                          and not cfg.is_train))
        return fpn_model(params["fpn"], c2345, use_gn=cfg.use_gn)

    def _rpn_all_levels(self, params, p23456):
        cfg = self.config
        outs = [rpn_head(params["rpn"], p, cfg.num_anchors_per_cell)
                for p in p23456]
        return [o[0] for o in outs], [o[1] for o in outs]

    def _proposals_single(self, label_logits, box_logits, fields, valids,
                          h: int, w: int):
        """Per-image FPN proposal generation (models.py:402-438 +
        nn.py:1353-1400), static shapes. Returns (boxes [K,4], valid [K])."""
        cfg = self.config
        # proposals are non-differentiable (sort/NMS); cut gradients here
        # like the reference (tf.stop_gradient, models.py:437-438)
        label_logits = [jax.lax.stop_gradient(x) for x in label_logits]
        box_logits = [jax.lax.stop_gradient(x) for x in box_logits]
        topk_per_level = (cfg.rpn_train_post_nms_topk if cfg.is_train
                          else cfg.rpn_test_post_nms_topk)
        kk = topk_per_level
        lvl_boxes, lvl_scores, lvl_valid = [], [], []
        for lvl in range(cfg.num_levels):
            field = jnp.asarray(fields[lvl]).reshape(-1, 4)
            vmask = jnp.asarray(valids[lvl]).reshape(-1)
            scores = label_logits[lvl].reshape(-1).astype(jnp.float32)
            deltas = box_logits[lvl].reshape(-1, 4).astype(jnp.float32)
            n_l = scores.shape[0]
            k_l = min(kk, n_l)
            masked = jnp.where(vmask, scores, -1e30)
            # top-k BEFORE decode: only the k survivors' deltas are
            # decoded/clipped (was all 235k anchors at 720p, ~1 ms/batch).
            # Big levels use TPU approx_max_k (see config.rpn_topk_recall).
            if cfg.rpn_topk_recall < 1.0 and n_l > 4 * k_l:
                top_scores, top_idx = jax.lax.approx_max_k(
                    masked, k_l, recall_target=cfg.rpn_topk_recall)
            else:
                top_scores, top_idx = jax.lax.top_k(masked, k_l)
            top_boxes = decode_boxes(deltas[top_idx], field[top_idx],
                                     cfg.bbox_decode_clip)
            top_boxes = clip_boxes(top_boxes, (h, w))
            top_valid = vmask[top_idx]
            wb = top_boxes[:, 2] - top_boxes[:, 0]
            hb = top_boxes[:, 3] - top_boxes[:, 1]
            top_valid &= (wb > cfg.rpn_min_size) & (hb > cfg.rpn_min_size)
            if k_l < kk:  # tiny pyramid tops: pad to a common K so the
                # per-level NMS batches into ONE fixpoint loop below
                top_boxes = jnp.pad(top_boxes, ((0, kk - k_l), (0, 0)))
                top_scores = jnp.pad(top_scores, (0, kk - k_l),
                                     constant_values=-1e30)
                top_valid = jnp.pad(top_valid, (0, kk - k_l))
            lvl_boxes.append(top_boxes)
            lvl_scores.append(top_scores)
            lvl_valid.append(top_valid)

        # one batched NMS over [L, K] instead of L sequential fixpoint
        # loops: the Jacobi iterations of all levels share each VPU step
        # (measured ~2x on the proposals stage at 720p B=8)
        boxes_lk = jnp.stack(lvl_boxes)
        scores_lk = jnp.stack(lvl_scores)
        valid_lk = jnp.stack(lvl_valid)
        sel, sel_valid = jax.vmap(
            lambda b, s, v: nms(b, s, kk, cfg.rpn_proposal_nms_thres,
                                valid=v))(boxes_lk, scores_lk, valid_lk)
        sel_c = jnp.maximum(sel, 0)
        boxes = jnp.where(
            sel_valid[..., None],
            jnp.take_along_axis(boxes_lk, sel_c[..., None], axis=1),
            0.0).reshape(-1, 4)
        scores = jnp.where(
            sel_valid, jnp.take_along_axis(scores_lk, sel_c, axis=1),
            -1e30).reshape(-1)
        valid = sel_valid.reshape(-1)
        k = min(kk, boxes.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        return boxes[top_idx], valid[top_idx]

    def _so_core(self, params, dec, prb, valid, feats):
        """One image's SO machinery (shared by inference and training):
        per-SO-class NMS of the decoded boxes, re-ROIAlign through the
        shared fc6/fc7, optional person-object relation, per-class 2-way
        logits. Returns (so_boxes [C, R, 4], so_valid [C, R],
        so_logits [C, R, 2])."""
        cfg = self.config
        r = cfg.result_per_im
        so_ids = [cfg.classname2id[n] - 1 for n in cfg.small_objects
                  if n in cfg.classname2id]
        n_so = len(so_ids)
        person_id = cfg.classname2id.get("Person", 1) - 1
        sop = params["small_objects"]

        def roi_head(boxes):
            rf = multilevel_roi_align(
                [x.astype(jnp.float32) for x in feats], boxes,
                cfg.anchor_strides[:4], 7)
            hp = params["fastrcnn"]
            hid = jax.nn.relu(heads_lib.dense(hp["fc6"], rf))
            return jax.nn.relu(heads_lib.dense(hp["fc7"], hid))

        so_boxes, so_valid = [], []
        for c in so_ids:
            idx, val = nms(dec[:, c], prb[:, c + 1], r,
                           cfg.fastrcnn_nms_iou_thres, valid=valid)
            idx_c = jnp.maximum(idx, 0)
            so_boxes.append(jnp.where(val[:, None], dec[idx_c, c], 0.0))
            so_valid.append(val)
        so_boxes = jnp.stack(so_boxes)       # [C, R, 4]
        so_valid = jnp.stack(so_valid)       # [C, R]

        hidden = roi_head(so_boxes.reshape(-1, 4))
        hidden = hidden.reshape(n_so, r, -1)

        if cfg.use_so_association:
            from .relation import person_object_relation
            pidx, pval = nms(dec[:, person_id], prb[:, person_id + 1],
                             cfg.so_person_topk,
                             cfg.fastrcnn_nms_iou_thres, valid=valid)
            pidx_c = jnp.maximum(pidx, 0)
            ref_boxes = jnp.where(pval[:, None],
                                  dec[pidx_c, person_id], 0.0)
            ref_feat = roi_head(ref_boxes)
            hidden = jnp.stack([
                hidden[i] + person_object_relation(
                    sop["person_object_relation"], hidden[i],
                    so_boxes[i], ref_boxes, ref_feat)
                for i in range(n_so)])

        so_logits = jnp.stack([
            heads_lib.dense(sop[f"small_object_classification_c{i+1}"],
                            hidden[i]) for i in range(n_so)])  # [C, R, 2]
        return so_boxes, so_valid, so_logits

    def _small_object_outputs(self, params, p23456, decoded, probs,
                              prop_valid, h: int, w: int):
        """Small-object 2-class refinement heads with optional person-object
        association (models.py:592-691, inference path 807-900).

        Per SO class: NMS the class's decoded boxes to R, re-ROIAlign, run
        the shared fc6/fc7, add the person-relation residual if enabled,
        classify fg/bg, then per-class NMS + global top-R like the main
        predictions. Returns so_final_* [B, R, ...] outputs."""
        cfg = self.config
        r = cfg.result_per_im
        n_so = len([n for n in cfg.small_objects if n in cfg.classname2id])

        def one_image(dec, prb, valid, f2, f3, f4, f5):
            so_boxes, so_valid, so_logits = self._so_core(
                params, dec, prb, valid, (f2, f3, f4, f5))

            # reconstruct [R, C+1] label logits (models.py:865-880)
            bg = so_logits[:, :, 0].mean(axis=0)
            label_logits = jnp.concatenate(
                [bg[:, None]] + [so_logits[i, :, 1:2]
                                 for i in range(n_so)], axis=1)
            so_probs = jax.nn.softmax(label_logits, axis=-1)
            boxes_t = jnp.swapaxes(so_boxes, 0, 1)  # [R, C, 4]
            boxes_t = clip_boxes(boxes_t, (h, w))
            # zero out candidates that didn't survive their class's NMS
            cand_valid = jnp.swapaxes(so_valid, 0, 1)       # [R, C]
            bg_col = jnp.ones((r, 1), bool)
            so_probs = jnp.where(
                jnp.concatenate([bg_col, cand_valid], axis=1), so_probs, 0.0)
            if cfg.use_so_score_thres:
                so_probs = jnp.where(so_probs > cfg.result_score_thres,
                                     so_probs, 0.0)
            return self._predictions_single(
                boxes_t, so_probs, jnp.ones((r,), bool))

        feat32 = [p for p in p23456[:4]]
        sb, sl, sp, sv, _ = jax.vmap(one_image)(
            decoded, probs, prop_valid, *feat32)
        return {"so_final_boxes": sb, "so_final_labels": sl,
                "so_final_probs": sp, "so_final_valid": sv}

    def _roi_align_batched(self, p23456, boxes, pool: int,
                           valid=None) -> jnp.ndarray:
        """FPN ROIAlign over the batch: Pallas window kernel (fast; feature
        dtype preserved, so the bf16 path skips f32 casts) or the exact XLA
        gather per config.roi_align_impl. Returns [B, N, pool, pool, C] f32.

        valid [B, N] bool (optional, inference Pallas path only): invalid
        slots — NMS-suppressed proposals, score-sorted to the back — skip
        their window DMA (the kernel's bound) and come back exactly zero,
        mirroring the reference's dynamic NMS-survivor count flowing into
        ROIAlign (nn.py:1390-1398)."""
        cfg = self.config
        # Which impl serves this call: training defaults to the exact XLA
        # gather even when roi_align_impl="pallas" — the Pallas forward
        # compiled into the fused train graph faults this backend's TPU
        # worker at step 0 (bisected round 4: same call passes the
        # standalone tools/roi_stress.py sweep; config.roi_align_train_impl
        # = "pallas" re-enables the custom-VJP wrapper elsewhere).
        impl = cfg.roi_align_impl
        if cfg.is_train and impl == "pallas":
            impl = getattr(cfg, "roi_align_train_impl", "xla")
        if impl == "pallas":
            if cfg.is_train:
                # custom VJP: Pallas forward, XLA scatter backward
                from ..ops.pallas.roi_align_pallas import (
                    multilevel_roi_align_trainable)
                return multilevel_roi_align_trainable(
                    tuple(p23456[:4]), boxes, cfg.anchor_strides[:4], pool)
            from ..ops.pallas import multilevel_roi_align_pallas
            return multilevel_roi_align_pallas(
                list(p23456[:4]), boxes, cfg.anchor_strides[:4], pool,
                valid=valid)
        feat32 = [p.astype(jnp.float32) for p in p23456[:4]]
        out = jax.vmap(
            lambda f2, f3, f4, f5, bx: multilevel_roi_align(
                [f2, f3, f4, f5], bx, cfg.anchor_strides[:4], pool)
        )(feat32[0], feat32[1], feat32[2], feat32[3], boxes)
        if valid is not None:
            out = jnp.where(valid[:, :, None, None, None], out, 0.0)
        return out

    def _apply_head(self, params, roi_feats, boxes):
        """Box head over [B, K, 7, 7, C] features. Flattens the batch into
        one big matmul normally; relation/attention variants need per-image
        box context, so they run under vmap instead."""
        cfg = self.config
        b, k = roi_feats.shape[:2]
        dt = jnp.dtype(cfg.compute_dtype)
        boxes_aware = cfg.add_relation_nn
        if boxes_aware:
            label_out, box_out = jax.vmap(
                lambda f, bx: heads_lib.fastrcnn_2fc_head(
                    params["fastrcnn"], f.astype(dt), cfg.num_class,
                    cfg.use_frcnn_class_agnostic, boxes=bx)
            )(roi_feats, boxes)
            return (label_out.astype(jnp.float32),
                    box_out.astype(jnp.float32))
        roi_flat = roi_feats.reshape(b * k, 7, 7,
                                     cfg.fpn_num_channel).astype(dt)
        label_out, box_out = heads_lib.fastrcnn_2fc_head(
            params["fastrcnn"], roi_flat, cfg.num_class,
            cfg.use_frcnn_class_agnostic)
        return (label_out.reshape(b, k, -1).astype(jnp.float32),
                box_out.reshape(b, k, -1, 4).astype(jnp.float32))

    def _predictions_single(self, decoded, probs, prop_valid):
        """Per-class NMS + global top-R (models.py:1258-1330), static.

        decoded: [K, C-1, 4] clipped boxes; probs: [K, C]; prop_valid: [K].
        Returns final (boxes [R,4], labels [R], probs [R], valid [R],
        class_idx [R] — index into the C-1 box classes for mask gather)."""
        cfg = self.config
        r = cfg.result_per_im
        k = decoded.shape[0]
        boxes_t = jnp.swapaxes(decoded, 0, 1)        # [C-1, K, 4]
        probs_t = jnp.swapaxes(probs[:, 1:], 0, 1)   # [C-1, K]
        vmask = jnp.broadcast_to(prop_valid[None, :], probs_t.shape)
        vmask = vmask & (probs_t > cfg.result_score_thres)

        # per-class top-kc preselect: identical greedy result unless a class
        # keeps > kc/2 boxes; keeps the NMS IOU matrices [C, kc, kc] small
        kc = min(2 * r, k)
        masked = jnp.where(vmask, probs_t, -1e30)
        sel_probs, sel_idx = jax.lax.top_k(masked, kc)         # [C-1, kc]
        sel_boxes = jnp.take_along_axis(
            boxes_t, sel_idx[:, :, None], axis=1)              # [C-1, kc, 4]
        sel_valid = jnp.take_along_axis(vmask, sel_idx, axis=1)

        def one_class(b, s, v):
            idx, val = nms(b, s, r, cfg.fastrcnn_nms_iou_thres, valid=v)
            idx_c = jnp.maximum(idx, 0)
            return (jnp.where(val[:, None], b[idx_c], 0.0),
                    jnp.where(val, s[idx_c], -1e30), val)

        cls_boxes, cls_probs, cls_valid = jax.vmap(one_class)(
            sel_boxes, sel_probs, sel_valid)

        flat_probs = cls_probs.reshape(-1)
        flat_valid = cls_valid.reshape(-1)
        flat_boxes = cls_boxes.reshape(-1, 4)
        k = min(r, flat_probs.shape[0])
        top_p, top_i = jax.lax.top_k(
            jnp.where(flat_valid, flat_probs, -1e30), k)
        final_valid = flat_valid[top_i]
        final_boxes = jnp.where(final_valid[:, None], flat_boxes[top_i], 0.0)
        class_idx = (top_i // r).astype(jnp.int32)    # 0..C-2
        final_labels = jnp.where(final_valid, class_idx + 1, 0)
        final_probs = jnp.where(final_valid, top_p, 0.0)
        if k < r:  # pad up to R
            pad = r - k
            final_boxes = jnp.pad(final_boxes, ((0, pad), (0, 0)))
            final_labels = jnp.pad(final_labels, (0, pad))
            final_probs = jnp.pad(final_probs, (0, pad))
            final_valid = jnp.pad(final_valid, (0, pad))
            class_idx = jnp.pad(class_idx, (0, pad))
        return final_boxes, final_labels, final_probs, final_valid, class_idx

    # ------------------------------------------------------------------
    # full forward

    def forward(self, params, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Batched inference. images: [B, h, w, 3] BGR (uint8 or float,
        0-255), h/w static. Returns dict of [B, ...] outputs."""
        cfg = self.config
        b, w = images.shape[0], images.shape[-1] if images.ndim == 3 \
            else images.shape[2]
        h = images.shape[1] * 2 // 3 if images.ndim == 3 else images.shape[1]
        hp, wp, fields, valids = self._static_geometry(h, w)

        p_images = self.preprocess(images, hp, wp, s2d=True)
        p23456 = self.backbone(params, p_images)
        label_logits, box_logits = self._rpn_all_levels(params, p23456)

        # Materialize conv outputs before the gather/sort-heavy proposal
        # machinery: without the barrier XLA fuses the RPN convs into every
        # downstream consumer and rematerializes the backbone several times
        # (measured 5x slowdown at B=4 on v5e).
        p23456, label_logits, box_logits = jax.lax.optimization_barrier(
            (p23456, label_logits, box_logits))

        prop_boxes, prop_valid = jax.vmap(
            lambda *lv: self._proposals_single(
                lv[:cfg.num_levels], lv[cfg.num_levels:], fields, valids,
                h, w))(*label_logits, *box_logits)

        # ROIAlign + head (flatten batch -> one big matmul batch)
        k = prop_boxes.shape[1]
        roi_feats = self._roi_align_batched(p23456, prop_boxes, 7,
                                            valid=prop_valid)
        label_out, box_out = self._apply_head(
            params, roi_feats, prop_boxes)

        if cfg.use_frcnn_class_agnostic:
            box_out = jnp.broadcast_to(
                box_out, (b, k, self.num_out_class - 1, 4))
        if self.partial_label_idx is not None:
            label_out = label_out[:, :, self.partial_label_idx]
            if not cfg.use_frcnn_class_agnostic:
                box_out = box_out[:, :, self.partial_box_idx, :]

        reg_w = jnp.asarray(cfg.fastrcnn_bbox_reg_weights, jnp.float32)
        anchors_rep = prop_boxes[:, :, None, :]
        decoded = decode_boxes(box_out / reg_w, anchors_rep,
                               cfg.bbox_decode_clip)
        decoded = clip_boxes(decoded, (h, w))
        probs = jax.nn.softmax(label_out, axis=-1)

        so_out = {}
        if cfg.use_small_object_head and "small_objects" in params:
            so_out = self._small_object_outputs(
                params, p23456, decoded, probs, prop_valid, h, w)

        fb, fl, fp, fv, fci = jax.vmap(self._predictions_single)(
            decoded, probs, prop_valid)

        box_feat = self._roi_align_batched(p23456, fb, 7, valid=fv)

        out = {
            "final_boxes": fb,
            "final_labels": fl,
            "final_probs": fp,
            "final_valid": fv,
            # 7x7-mean-pooled on device: this is the only form the trackers
            # consume (deep_sort/utils.py:27-28) and it cuts the
            # device->host transfer 49x vs shipping the full [R,7,7,256]
            "pooled_box_feat": box_feat.mean(axis=(2, 3)),
        }
        if self.keep_full_box_feat:
            out["fpn_box_feat"] = box_feat

        out.update(so_out)

        if cfg.add_mask and "maskrcnn" in params:
            r = cfg.result_per_im
            mask_roi = self._roi_align_batched(p23456, fb, 14, valid=fv)
            mask_roi = mask_roi.reshape(b * r, 14, 14, cfg.fpn_num_channel)
            mask_logits = heads_lib.maskrcnn_up4conv_head(
                params["maskrcnn"],
                mask_roi.astype(jnp.dtype(cfg.compute_dtype)),
                cfg.num_class).astype(jnp.float32)
            mask_logits = mask_logits.reshape(b, r, 28, 28, -1)
            sel = jnp.clip(fci, 0, mask_logits.shape[-1] - 1)
            picked = jnp.take_along_axis(
                mask_logits, sel[:, :, None, None, None], axis=-1)[..., 0]
            out["final_masks"] = jax.nn.sigmoid(picked)

        return out

    def make_infer_fn(self):
        """jit-compiled batched forward: fn(params, images[B,h,w,3])."""
        return jax.jit(self.forward)

    def extract_box_feat(self, params, images: jnp.ndarray,
                         boxes: jnp.ndarray) -> jnp.ndarray:
        """Feature-extractor-only graph: given images [B, h, w, 3] and boxes
        [B, N, 4] (image coords), return mean-pooled ROI features [B, N, C]
        (replaces RCNN_FPN_givenbox, models.py:1816-1967 — used by the
        activity-recognition pipelines)."""
        b, h, w = images.shape[0], images.shape[1], images.shape[2]
        hp, wp, _, _ = self._static_geometry(h, w)
        p_images = self.preprocess(images, hp, wp, s2d=True)
        p23456 = self.backbone(params, p_images)
        feats = self._roi_align_batched(p23456, boxes, 7)
        return feats.mean(axis=(2, 3))

    # ------------------------------------------------------------------
    # training forward

    def forward_train(self, params, images: jnp.ndarray,
                      gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                      gt_valid: jnp.ndarray, rng,
                      gt_masks: jnp.ndarray = None) -> Dict[str, jnp.ndarray]:
        """Training losses. images [B, h, w, 3]; gt_boxes [B, G, 4] padded;
        gt_labels [B, G] int (1..C-1); gt_valid [B, G] bool; gt_masks
        optional [B, G, Ms, Ms] box-local rasterized instance masks
        (enables the Mask-RCNN head loss when config.add_mask).

        Replaces the reference's host-side anchor labeling + in-graph
        dynamic sampling (models.py:1468-1627, 3380-3486) with fully
        on-device static-shape target assignment (train/targets.py).
        """
        from ..train import losses as loss_lib
        from ..train import targets as target_lib

        cfg = self.config
        b, h, w = images.shape[0], images.shape[1], images.shape[2]
        hp, wp, fields, valids = self._static_geometry(h, w)

        p_images = self.preprocess(images, hp, wp, s2d=True)
        p23456 = self.backbone(params, p_images)
        label_logits, box_logits = self._rpn_all_levels(params, p23456)
        p23456, label_logits, box_logits = jax.lax.optimization_barrier(
            (p23456, label_logits, box_logits))

        # ---- RPN losses over the flat all-level anchor set
        flat_anchors = jnp.concatenate(
            [jnp.asarray(f).reshape(-1, 4) for f in fields], axis=0)
        flat_label_logits = jnp.concatenate(
            [l.reshape(b, -1) for l in label_logits], axis=1)
        flat_box_logits = jnp.concatenate(
            [l.reshape(b, -1, 4) for l in box_logits], axis=1)

        keys = jax.random.split(rng, b * 2)
        rpn_keys, sample_keys = keys[:b], keys[b:]

        def rpn_one(rng_i, gt_b, gt_v, ll, bl):
            labels, tboxes = target_lib.anchor_targets(
                rng_i, flat_anchors, gt_b, gt_v, (h, w),
                cfg.rpn_batch_per_im, cfg.rpn_fg_ratio,
                cfg.positive_anchor_thres, cfg.negative_anchor_thres)
            safe_t = jnp.where((labels == 1)[:, None], tboxes, flat_anchors)
            return loss_lib.rpn_losses(
                labels, safe_t, flat_anchors, ll, bl, cfg.rpn_batch_per_im,
                use_focal=cfg.focal_loss)

        rpn_loss = jax.vmap(rpn_one)(
            rpn_keys, gt_boxes, gt_valid, flat_label_logits,
            flat_box_logits)

        # ---- proposals (train topk) + target sampling
        prop_boxes, prop_valid = jax.vmap(
            lambda *lv: self._proposals_single(
                lv[:cfg.num_levels], lv[cfg.num_levels:], fields, valids,
                h, w))(*label_logits, *box_logits)
        prop_boxes = jax.lax.stop_gradient(prop_boxes)

        def sample_one(rng_i, boxes, valid, gt_b, gt_l, gt_v):
            return target_lib.sample_fastrcnn_targets(
                rng_i, boxes, valid, gt_b, gt_l, gt_v,
                cfg.fastrcnn_batch_per_im, cfg.fastrcnn_fg_ratio,
                cfg.fastrcnn_fg_thres)

        samples = jax.vmap(sample_one)(
            sample_keys, prop_boxes, prop_valid, gt_boxes, gt_labels,
            gt_valid)

        # guard padded rows so encode/decode stay finite under grad
        unit = jnp.asarray([0.0, 0.0, 1.0, 1.0])
        roi_boxes = jnp.where(samples["valid"][..., None],
                              samples["boxes"], unit)

        s = roi_boxes.shape[1]
        roi_feats = self._roi_align_batched(p23456, roi_boxes, 7)
        label_out, box_out = self._apply_head(params, roi_feats, roi_boxes)

        from ..ops.boxes import encode_boxes
        reg_w = jnp.asarray(cfg.fastrcnn_bbox_reg_weights, jnp.float32)
        fg_gt_safe = jnp.where(samples["fg"][..., None],
                               samples["fg_gt_boxes"], roi_boxes)
        enc_fg = encode_boxes(fg_gt_safe, roi_boxes) * reg_w

        frcnn_loss = jax.vmap(
            lambda *a: loss_lib.fastrcnn_losses(
                *a, use_focal=cfg.focal_loss))(
            samples["labels"], label_out, enc_fg, box_out,
            samples["valid"], samples["fg"])

        losses = {k: v.mean() for k, v in
                  {**rpn_loss, **frcnn_loss}.items()}

        if cfg.use_small_object_head and "small_objects" in params:
            losses["so_label_loss"] = self._so_train_loss(
                params, p23456, roi_boxes, samples["valid"], label_out,
                box_out, gt_boxes, gt_labels, gt_valid, h, w)

        if cfg.add_mask and "maskrcnn" in params and gt_masks is not None:
            losses["mrcnn_loss"] = self._mask_train_loss(
                params, p23456, roi_boxes, samples, gt_masks)

        losses["total_loss"] = sum(losses.values())
        return losses

    def _mask_train_loss(self, params, p23456, roi_boxes, samples,
                         gt_masks):
        """Mask-RCNN training loss (models.py:744-776, 1307-1326): the mask
        head runs on the fg sample slots only (they are packed first by
        sample_fastrcnn_targets); 28x28 targets come from resampling each
        fg row's matched box-local gt mask onto its roi box grid."""
        from ..train import losses as loss_lib
        cfg = self.config
        s = roi_boxes.shape[1]
        fg_cap = min(int(cfg.fastrcnn_batch_per_im * cfg.fastrcnn_fg_ratio),
                     s)
        fg_boxes = roi_boxes[:, :fg_cap]
        fg_flags = samples["fg"][:, :fg_cap]
        fg_labels = samples["labels"][:, :fg_cap]
        fg_gt_idx = samples["fg_gt_idx"][:, :fg_cap]
        fg_gt_boxes = samples["fg_gt_boxes"][:, :fg_cap]
        # keep the coordinate map well-conditioned on padded rows
        unit = jnp.asarray([0.0, 0.0, 1.0, 1.0])
        safe_gt = jnp.where(fg_flags[..., None], fg_gt_boxes, unit)

        b = fg_boxes.shape[0]
        mask_feats = self._roi_align_batched(p23456, fg_boxes, 14)
        mask_logits = heads_lib.maskrcnn_up4conv_head(
            params["maskrcnn"],
            mask_feats.reshape(b * fg_cap, 14, 14, cfg.fpn_num_channel
                               ).astype(jnp.dtype(cfg.compute_dtype)),
            cfg.num_class).astype(jnp.float32)
        mask_logits = mask_logits.reshape(b, fg_cap, 28, 28, -1)

        def one_image(logits, labels, fg, gidx, gt_b, rois, masks_im):
            tgt = jax.vmap(loss_lib.crop_mask_to_roi)(
                masks_im[gidx].astype(jnp.float32), gt_b, rois)
            tgt = (tgt >= 0.5).astype(jnp.float32)
            return loss_lib.maskrcnn_loss(logits, labels, fg, tgt)

        per_img = jax.vmap(one_image)(
            mask_logits, fg_labels, fg_flags, fg_gt_idx, safe_gt, fg_boxes,
            gt_masks)
        return per_img.mean()

    def _so_train_loss(self, params, p23456, roi_boxes, roi_valid,
                       label_out, box_out, gt_boxes, gt_labels, gt_valid,
                       h, w):
        """Small-object head training loss (models.py:735-749 +
        get_so_labels, nn.py:1176-1223): rebuild the SO candidate boxes
        from the current head predictions, label each fg/bg by IOU >=
        fastrcnn_fg_thres against that SO class's gt, mean CE."""
        from ..ops.boxes import pairwise_iou
        from ..train.losses import softmax_ce
        cfg = self.config
        so_names = [n for n in cfg.small_objects if n in cfg.classname2id]
        so_cids = [cfg.classname2id[n] for n in so_names]

        reg_w = jnp.asarray(cfg.fastrcnn_bbox_reg_weights, jnp.float32)
        box_full = box_out
        if cfg.use_frcnn_class_agnostic:
            box_full = jnp.broadcast_to(
                box_out, box_out.shape[:2] + (cfg.num_class - 1, 4))
        decoded = decode_boxes(box_full / reg_w, roi_boxes[:, :, None, :],
                               cfg.bbox_decode_clip)
        decoded = clip_boxes(decoded, (h, w))
        probs = jax.nn.softmax(label_out, axis=-1)

        def one_image(dec, prb, valid, f2, f3, f4, f5, gt_b, gt_l, gt_v):
            so_boxes, so_valid, so_logits = self._so_core(
                params, dec, prb, valid, (f2, f3, f4, f5))
            total = 0.0
            for i, cid in enumerate(so_cids):
                cls_gt = gt_v & (gt_l == cid)
                iou = pairwise_iou(so_boxes[i], gt_b)        # [R, G]
                iou = jnp.where(cls_gt[None, :], iou, 0.0)
                lab = (iou.max(axis=1) >=
                       cfg.fastrcnn_fg_thres).astype(jnp.int32)
                ce = softmax_ce(so_logits[i].astype(jnp.float32), lab)
                n_valid = jnp.maximum(so_valid[i].sum(), 1)
                total = total + jnp.where(so_valid[i], ce, 0.0).sum() \
                    / n_valid
            return total / len(so_cids)

        feat32 = [p for p in p23456[:4]]
        per_img = jax.vmap(one_image)(
            decoded, probs, roi_valid, *feat32, gt_boxes, gt_labels,
            gt_valid)
        return per_img.mean()
