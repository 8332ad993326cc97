"""EfficientDet assembly: backbone -> BiFPN -> heads -> postprocess.

Reference: efficientdet_arch.py (BiFPN fast-attention fusion, separable
class/box nets shared across levels with per-level BN) and
efficientdet_wrapper.py (global top-k across levels, NMS, level-indexed
ROIAlign for tracking features).
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp

from ...ops.boxes import clip_boxes
from ...ops.nms import nms
from ...ops.norm import init_bn, frozen_bn
from ..layers import conv2d, init_conv, max_pool, upsample2x_nearest
from .anchors import decode_effdet_boxes, effdet_anchors
from .efficientnet import (efficientnet_c345, init_efficientnet, swish)

# name -> (backbone, image_size, fpn_filters, fpn_repeats, head_repeats,
#          fusion, anchor_scale)  — reference hparams
# efficientdet_wrapper.py:511-587; d6/d7 use unweighted-sum BiFPN fusion
# ("bifpn_sum", for training stability) and d7 widens the anchors to 5.0.
EFFICIENTDET_CONFIGS = {
    "efficientdet-d0": ("efficientnet-b0", 512, 64, 3, 3, "fastattn", 4.0),
    "efficientdet-d1": ("efficientnet-b1", 640, 88, 4, 3, "fastattn", 4.0),
    "efficientdet-d2": ("efficientnet-b2", 768, 112, 5, 3, "fastattn", 4.0),
    "efficientdet-d3": ("efficientnet-b3", 896, 160, 6, 4, "fastattn", 4.0),
    "efficientdet-d4": ("efficientnet-b4", 1024, 224, 7, 4, "fastattn", 4.0),
    "efficientdet-d5": ("efficientnet-b5", 1280, 288, 7, 4, "fastattn", 4.0),
    "efficientdet-d6": ("efficientnet-b6", 1280, 384, 8, 5, "sum", 4.0),
    "efficientdet-d7": ("efficientnet-b6", 1536, 384, 8, 5, "sum", 5.0),
    # tiny variant for CPU unit tests only (not a reference model)
    "efficientdet-test": ("efficientnet-b0", 128, 32, 2, 2, "fastattn", 4.0),
}

# BiFPN graph (bifpn_dynamic_config for levels 3..7): inputs are node ids;
# ids 0..4 = P3..P7 backbone-side, then one new id per fnode.
BIFPN_NODES = [
    (6, (3, 4)),
    (5, (2, 5)),
    (4, (1, 6)),
    (3, (0, 7)),
    (4, (1, 7, 8)),
    (5, (2, 6, 9)),
    (6, (3, 5, 10)),
    (7, (4, 11)),
]
MIN_LEVEL, MAX_LEVEL = 3, 7
NUM_ANCHORS = 9


def _init_sep_conv(rng, cin, cout, kernel=3, bias=True):
    r1, r2 = jax.random.split(rng)
    p = {
        "dw": init_conv(r1, kernel, cin, cin, use_bias=False, groups=cin,
                        w_init="xavier1"),
        "pw": init_conv(r2, 1, cin, cout, use_bias=bias, w_init="xavier1"),
    }
    return p


def _sep_conv(p, x, kernel=3):
    pad = kernel // 2
    x = conv2d(p["dw"], x, padding=((pad, pad), (pad, pad)),
               groups=x.shape[-1])
    return conv2d(p["pw"], x)


class EfficientDet:
    """Same interface as FasterRCNNFPN: init_params / forward /
    make_infer_fn. Output classes follow the model's class map (COCO 90-id
    mapping handled by the caller via class_ids.coco_id_mapping)."""

    def __init__(self, config, model_name: str = None):
        self.config = config
        name = model_name or getattr(config, "efficientdet_name",
                                     "efficientdet-d0")
        (self.backbone_name, self.image_size, self.fpn_filters,
         self.fpn_repeats, self.head_repeats, self.fusion,
         self.anchor_scale) = EFFICIENTDET_CONFIGS[name]
        if getattr(config, "efficientdet_image_size", 0):
            self.image_size = config.efficientdet_image_size
        self.name = name
        self.num_classes = config.num_class - 1  # sigmoid heads, no BG row
        # partial-class inference: gather only the tracked classes' score
        # columns before NMS (reference efficientdet_wrapper.py:398-412);
        # the heads keep the full class count for checkpoint compatibility
        if config.partial_classes:
            from ...class_ids import coco_obj_class_to_id
            self.partial_score_idx = jnp.asarray(
                [coco_obj_class_to_id[n] - 1 for n in config.partial_classes],
                jnp.int32)
        else:
            self.partial_score_idx = None

    # ------------------------------------------------------------------

    def init_params(self, rng) -> Dict:
        r_bb, r_resample, r_fpn, r_cls, r_box = jax.random.split(rng, 5)
        c = self.fpn_filters
        params: Dict = {"backbone": init_efficientnet(r_bb,
                                                      self.backbone_name)}
        from .efficientnet import scaled_block_args
        args = scaled_block_args(self.backbone_name)
        c3, c4, c5 = args[2][4], args[4][4], args[6][4]
        raw_ch = {0: c3, 1: c4, 2: c5}   # input node id -> raw channels
        # P6 input: 1x1 C5->C + bn + maxpool (reference resample_p6); P7 is
        # a further maxpool with no variables (resample_p7)
        rs = jax.random.split(r_resample, 2)
        p6 = init_conv(rs[0], 1, c5, c, use_bias=True, w_init="xavier1")
        p6["bn"] = init_bn(c)
        params["resample"] = {"p6": p6}

        # BiFPN cells. Raw backbone levels (P3-P5 at backbone channels)
        # enter cell_0 directly; each fnode input that touches one gets its
        # OWN channel-matching 1x1+bn, scoped like the reference
        # ("resample_{input_idx}_{offset}_{new_node_id}",
        # efficientdet_arch.py:612-616) — weight-isomorphic with published
        # checkpoints (a level consumed by two fnodes has two 1x1s).
        cells = {}
        for rep in range(self.fpn_repeats):
            rc = jax.random.split(jax.random.fold_in(r_fpn, rep),
                                  len(BIFPN_NODES))
            cell = {}
            for ni, (lvl, inputs) in enumerate(BIFPN_NODES):
                node = _init_sep_conv(rc[ni], c, c, bias=True)
                node["bn"] = init_bn(c)
                if self.fusion == "fastattn":
                    node["wsm"] = jnp.ones((len(inputs),), jnp.float32)
                if rep == 0:
                    for idx, off in enumerate(inputs):
                        if off in raw_ch:
                            rp = init_conv(
                                jax.random.fold_in(rc[ni], idx), 1,
                                raw_ch[off], c, use_bias=True,
                                w_init="xavier1")
                            rp["bn"] = init_bn(c)
                            node[f"resample_{idx}_{off}_{5 + ni}"] = rp
                cell[f"fnode{ni}"] = node
            cells[f"cell_{rep}"] = cell
        params["fpn_cells"] = cells

        # class / box nets: convs shared across levels, BN per level
        def head(rng_h, out_ch, bias_init):
            layers = {}
            hr = jax.random.split(rng_h, self.head_repeats + 1)
            for i in range(self.head_repeats):
                layers[f"conv{i}"] = _init_sep_conv(hr[i], c, c)
                for lvl in range(MIN_LEVEL, MAX_LEVEL + 1):
                    layers[f"bn{i}_l{lvl}"] = init_bn(c)
            pred = _init_sep_conv(hr[-1], c, out_ch)
            pred["pw"]["b"] = jnp.full((out_ch,), bias_init, jnp.float32)
            layers["predict"] = pred
            return layers

        params["class_net"] = head(
            r_cls, self.num_classes * NUM_ANCHORS,
            -math.log((1 - 0.01) / 0.01))
        params["box_net"] = head(r_box, 4 * NUM_ANCHORS, 0.0)
        return params

    # ------------------------------------------------------------------

    def preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        """[B, h, w, 3] BGR (or [B, 3h/2, w] I420) -> padded normalized RGB
        [B, S, S, 3] (dataloader.py normalize_image + pad-to-square)."""
        from ..faster_rcnn import FasterRCNNFPN
        if images.ndim == 3:
            images = FasterRCNNFPN.i420_to_bgr(images)
        x = images.astype(jnp.float32)[..., ::-1] / 255.0  # BGR -> RGB
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x = (x - mean) / std
        s = self.image_size
        b, h, w = x.shape[:3]
        x = jnp.pad(x, ((0, 0), (0, s - h), (0, s - w), (0, 0)))
        return x.astype(jnp.dtype(self.config.compute_dtype))

    def _bifpn_cell(self, cell, feats: List[jnp.ndarray], bn=frozen_bn):
        """feats: P3..P7 (ids 0..4); returns new P3..P7. Cell-0 inputs may
        carry raw backbone channels — each fnode's lazy 1x1+bn (reference
        resample_feature_map: conv BEFORE the spatial resample) fixes them.
        """
        nodes = list(feats)
        sizes = [f.shape[1] for f in feats]
        for ni, (lvl, inputs) in enumerate(BIFPN_NODES):
            p = cell[f"fnode{ni}"]
            target = sizes[lvl - MIN_LEVEL]
            resampled = []
            for idx, off in enumerate(inputs):
                n = nodes[off]
                rkey = f"resample_{idx}_{off}_{5 + ni}"
                if rkey in p:
                    rp = p[rkey]
                    n = bn(rp["bn"], conv2d(rp, n))
                if n.shape[1] > target:       # downsample by 2
                    n = max_pool(n, 3, 2, padding=((1, 0), (1, 0)))
                elif n.shape[1] < target:     # upsample by 2
                    n = upsample2x_nearest(n)
                resampled.append(n)
            if "wsm" in p:       # fast-attention fusion
                w = jax.nn.relu(p["wsm"])
                w = w / (w.sum() + 1e-4)
                fused = sum(r * w[i].astype(r.dtype)
                            for i, r in enumerate(resampled))
            else:                # unweighted sum (d6/d7 "bifpn_sum")
                fused = sum(resampled)
            fused = swish(fused)
            out = _sep_conv(p, fused)
            out = bn(p["bn"], out)
            nodes.append(out)
        # output node ids: P3''=8, P4''=9, P5''=10, P6''=11, P7''=12
        return [nodes[8], nodes[9], nodes[10], nodes[11], nodes[12]]

    def _heads(self, params, feats, bn=frozen_bn):
        cls_outs, box_outs = [], []
        for li, f in enumerate(feats):
            lvl = MIN_LEVEL + li
            x = f
            hp = params["class_net"]
            for i in range(self.head_repeats):
                orig = x
                x = _sep_conv(hp[f"conv{i}"], x)
                x = swish(bn(hp[f"bn{i}_l{lvl}"], x))
                if i > 0:
                    x = x + orig
            cls_outs.append(_sep_conv(hp["predict"], x))
            x = f
            hp = params["box_net"]
            for i in range(self.head_repeats):
                orig = x
                x = _sep_conv(hp[f"conv{i}"], x)
                x = swish(bn(hp[f"bn{i}_l{lvl}"], x))
                if i > 0:
                    x = x + orig
            box_outs.append(_sep_conv(hp["predict"], x))
        return cls_outs, box_outs

    def _postprocess_single(self, cls_flat, box_flat, anchors_flat,
                            anchor_levels, hw):
        """One image: sigmoid scores, global top-k pre-select, decode,
        per-class NMS to result_per_im (efficientdet_wrapper.py:367-487).
        Each detection's *source anchor level* is carried through so the
        tracking-feature ROIAlign pools from the level that produced it
        (efficientdet_wrapper.py:265-301)."""
        cfg = self.config
        r = cfg.result_per_im
        scores_all = jax.nn.sigmoid(cls_flat)          # [N, C]
        if self.partial_score_idx is not None:
            scores_all = scores_all[:, self.partial_score_idx]
        best = scores_all.max(axis=1)
        k = min(cfg.efficientdet_max_detection_topk,
                best.shape[0])
        _, top_i = jax.lax.top_k(best, k)
        scores = scores_all[top_i]                     # [k, C]
        levels = anchor_levels[top_i]                  # [k]
        boxes = decode_effdet_boxes(box_flat[top_i], anchors_flat[top_i])
        boxes = clip_boxes(boxes, hw)

        # per-class top-kc preselect keeps the NMS matrices tiny
        # (the greedy result is unchanged unless a class would keep >kc/2
        # boxes — far beyond any real frame)
        kc = min(2 * r, k)
        cls_scores, cls_idx = jax.lax.top_k(scores.T, kc)     # [C, kc]
        cls_boxes = boxes[cls_idx]                             # [C, kc, 4]
        cls_lvls = levels[cls_idx]                             # [C, kc]
        valid = cls_scores > cfg.result_score_thres

        def one_class(b, s, lv, v):
            idx, val = nms(b, s, r, cfg.fastrcnn_nms_iou_thres, valid=v)
            idx_c = jnp.maximum(idx, 0)
            return (jnp.where(val[:, None], b[idx_c], 0.0),
                    jnp.where(val, s[idx_c], -1e30),
                    jnp.where(val, lv[idx_c], 0), val)

        cb, cp, cl, cv = jax.vmap(one_class)(cls_boxes, cls_scores,
                                             cls_lvls, valid)

        flat_p = cp.reshape(-1)
        flat_v = cv.reshape(-1)
        flat_b = cb.reshape(-1, 4)
        flat_l = cl.reshape(-1)
        top_p, top_idx = jax.lax.top_k(jnp.where(flat_v, flat_p, -1e30), r)
        final_valid = flat_v[top_idx]
        final_boxes = jnp.where(final_valid[:, None], flat_b[top_idx], 0.0)
        final_labels = jnp.where(final_valid,
                                 (top_idx // r).astype(jnp.int32) + 1, 0)
        final_probs = jnp.where(final_valid, top_p, 0.0)
        final_levels = jnp.where(final_valid, flat_l[top_idx], 0)
        return (final_boxes, final_labels, final_probs, final_valid,
                final_levels)

    # ------------------------------------------------------------------

    def _features_and_flat_heads(self, params, images, bn=frozen_bn):
        """Shared trunk for forward/forward_train: preprocess -> backbone ->
        BiFPN -> heads, with per-anchor flattening and the flat anchor set.
        Returns (feats P3..P7, cls_flat [B,N,C] logits, box_flat [B,N,4],
        anchors_flat [N,4], anchor_levels [N], (h, w), b)."""
        b = images.shape[0]
        h = images.shape[1] * 2 // 3 if images.ndim == 3 else images.shape[1]
        w = images.shape[-1] if images.ndim == 3 else images.shape[2]

        x = self.preprocess(images)
        c3, c4, c5 = efficientnet_c345(params["backbone"], x,
                                       self.backbone_name, bn=bn)
        rp = params["resample"]
        # raw P3-P5 enter cell_0 at backbone channels (channel matching
        # happens per-fnode inside the cell, mirroring the reference graph)
        p6 = bn(rp["p6"]["bn"], conv2d(rp["p6"], c5))
        p6 = max_pool(p6, 3, 2, padding=((1, 0), (1, 0)))
        p7 = max_pool(p6, 3, 2, padding=((1, 0), (1, 0)))
        feats = [c3, c4, c5, p6, p7]
        for rep in range(self.fpn_repeats):
            feats = self._bifpn_cell(params["fpn_cells"][f"cell_{rep}"],
                                     feats, bn=bn)
        cls_outs, box_outs = self._heads(params, feats, bn=bn)

        anchors = effdet_anchors((self.image_size, self.image_size),
                                 anchor_scale=self.anchor_scale)
        anchors_flat = jnp.concatenate(
            [jnp.asarray(a).reshape(-1, 4) for a in anchors], axis=0)
        import numpy as onp
        anchor_levels = jnp.asarray(onp.concatenate(
            [onp.full(a.size // 4, li, onp.int32)
             for li, a in enumerate(anchors)]))
        cls_flat = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes).astype(jnp.float32)
             for c in cls_outs], axis=1)
        box_flat = jnp.concatenate(
            [bo.reshape(b, -1, 4).astype(jnp.float32) for bo in box_outs],
            axis=1)
        return feats, cls_flat, box_flat, anchors_flat, anchor_levels, \
            (h, w), b

    def forward(self, params, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        (feats, cls_flat, box_flat, anchors_flat, anchor_levels,
         (h, w), b) = self._features_and_flat_heads(params, images)
        feats, cls_flat, box_flat = jax.lax.optimization_barrier(
            (feats, cls_flat, box_flat))

        fb, fl, fp, fv, flv = jax.vmap(
            lambda cf, bf: self._postprocess_single(
                cf, bf, anchors_flat, anchor_levels, (h, w)))(
                    cls_flat, box_flat)

        # level-indexed ROIAlign tracking features over the BiFPN pyramid:
        # each detection pools from its source anchor level
        # (efficientdet_wrapper.py:265-301); strides 8..128 for P3..P7
        from ...ops.pallas import multilevel_roi_align_pallas
        from ...ops.roi_align import multilevel_roi_align
        strides = tuple(2 ** (MIN_LEVEL + i) for i in range(5))
        if cfg.roi_align_impl == "pallas":
            box_feat = multilevel_roi_align_pallas(
                list(feats), fb, strides, 7, levels=flv)
        else:
            f32 = [f.astype(jnp.float32) for f in feats]
            box_feat = jax.vmap(
                lambda f3, f4, f5, f6, f7, bx, lv: multilevel_roi_align(
                    [f3, f4, f5, f6, f7], bx, strides, 7, levels=lv)
            )(*f32, fb, flv)

        return {
            "final_boxes": fb,
            "final_labels": fl,
            "final_probs": fp,
            "final_valid": fv,
            "pooled_box_feat": box_feat.mean(axis=(2, 3)),
        }

    def make_infer_fn(self):
        return jax.jit(self.forward)

    # ------------------------------------------------------------------

    def forward_train(self, params, images, gt_boxes, gt_labels, gt_valid,
                      rng, gt_masks=None) -> Dict[str, jnp.ndarray]:
        """Training losses (the reference vendors only inference; losses
        follow the published automl recipe the reference's checkpoints
        were trained with — hparams_config.py:207-211: focal alpha 0.25 /
        gamma 1.5, huber delta 0.1, box_loss_weight 50 — with the
        AnchorLabeler semantics of efficientdet/anchors.py:540).

        Same signature as FasterRCNNFPN.forward_train so Trainer and the
        sharded train step drive either detector unchanged."""
        del rng, gt_masks  # anchor labeling is deterministic (no sampling)
        from ...ops.norm import batch_bn
        from ...train.losses import focal_loss, huber
        from ...train.targets import effdet_anchor_targets

        # train with CURRENT-batch BN statistics (reference
        # efficientnet_model.py trains with real batch norm; the frozen
        # affine does not optimize from scratch — r05 measured focal loss
        # plateau 1.06 / AP 0.01 without this). Inference stats come from
        # calibrate_bn after training.
        (_, cls_flat, box_flat, anchors_flat, _,
         _, b) = self._features_and_flat_heads(params, images, bn=batch_bn)

        cls_t, box_t, fg = jax.vmap(
            lambda gb, gl, gv: effdet_anchor_targets(
                anchors_flat, gb, gl, gv))(gt_boxes, gt_labels, gt_valid)

        # one-hot WITHOUT a background column (sigmoid heads): label 0
        # (bg) maps to the all-zeros row via the label-1 shift
        onehot = jax.nn.one_hot(cls_t - 1, self.num_classes,
                                dtype=jnp.float32)            # [B, N, C]
        num_pos = jnp.maximum(fg.sum().astype(jnp.float32), 1.0)
        cls_loss = focal_loss(cls_flat, onehot, alpha=0.25,
                              gamma=1.5).sum() / num_pos
        box_err = huber(box_flat - box_t, delta=0.1)
        box_loss = jnp.where(fg[..., None], box_err, 0.0).sum() \
            / (num_pos * 4.0)
        total = cls_loss + 50.0 * box_loss
        return {
            "total_loss": total,
            "effdet_cls_loss": cls_loss,
            "effdet_box_loss": box_loss,
            "num_pos_anchors": num_pos / b,
        }

    def calibrate_bn(self, params, image_batches, max_batches: int = 16):
        """Precise-BN recalibration: run up to ``max_batches`` training
        batches through the trunk with batch statistics, average each BN
        site's batch mean/var, and write them into ``params`` (in place,
        also returned). Inference (``forward``) then uses these
        population stats via frozen_bn — the EMA-free functional
        equivalent of the reference's moving averages
        (efficientnet_model.py BN momentum 0.99).

        Two passes: (1) an abstract jax.eval_shape trace with the real
        params CLOSED OVER records each BN param dict in call order at
        zero device cost (the call sequence is static Python control
        flow, so it is input-independent); (2) a single jitted function
        returns every site's (mean, var) per batch — one compile, one
        device round-trip per batch."""
        import numpy as onp

        order = []

        def record_bn(p, x):
            order.append(p)
            return frozen_bn(p, x)

        jax.eval_shape(
            lambda im: self._features_and_flat_heads(params, im,
                                                     bn=record_bn),
            jax.ShapeDtypeStruct((1, self.image_size, self.image_size, 3),
                                 jnp.uint8))
        batches = iter(image_batches)
        first = onp.asarray(next(batches))

        def stats_fn(prm, images):
            recs = []

            def bn(p, x):
                from ...ops.norm import batch_bn
                mu = x.mean(axis=(0, 1, 2), dtype=jnp.float32)
                var = jnp.square(x.astype(jnp.float32)).mean(
                    axis=(0, 1, 2)) - jnp.square(mu)
                recs.append((mu, var))
                return batch_bn(p, x)

            self._features_and_flat_heads(prm, images, bn=bn)
            return recs

        jfn = jax.jit(stats_fn)
        sums = None
        n = 0
        for images in [first] + list(
                onp.asarray(b) for _, b in zip(range(max_batches - 1),
                                               batches)):
            recs = jax.device_get(jfn(params, jnp.asarray(images)))
            if sums is None:
                sums = [[onp.array(mu, onp.float64),
                         onp.array(var, onp.float64)] for mu, var in recs]
            else:
                for i, (mu, var) in enumerate(recs):
                    sums[i][0] += mu
                    sums[i][1] += var
            n += 1
        assert len(order) == len(sums), (len(order), len(sums))
        for p, (mu, var) in zip(order, sums):
            p["mean"] = jnp.asarray(mu / n, jnp.float32)
            p["variance"] = jnp.asarray(var / n, jnp.float32)
        print(f"calibrated {len(order)} BN sites over {n} batches")
        return params
