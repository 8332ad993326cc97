"""Detection evaluation: per-class AP/AR at IOU 0.5.

Reference parity (utils.py:436-846, eval.py): greedy score-ranked matching
per image (match_detection), global score-sorted accumulation
(aggregate_eval), AP normalized by total gt (computeAP_v2) and AR as
TP/num_gt (computeAR_2). Boxes are COCO xywh on the host.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from .ops.boxes import pairwise_iou_np


def _xywh_to_xyxy(boxes) -> np.ndarray:
    b = np.asarray(boxes, np.float64).reshape(-1, 4).copy()
    b[:, 2] += b[:, 0]
    b[:, 3] += b[:, 1]
    return b


def iou_xywh(d: Sequence, g: Sequence) -> np.ndarray:
    """[D, G] IOU over xywh boxes (pycocotools.iou iscrowd=0 semantics)."""
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    return pairwise_iou_np(_xywh_to_xyxy(d), _xywh_to_xyxy(g))


def match_detection(d: Sequence, g: Sequence, ious: np.ndarray,
                    iou_thres: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy match score-ranked detections to gt (utils.py:573-603).
    Returns (dtm [D], gtm [G]) with matched indices or -1."""
    D, G = len(d), len(g)
    gtm = -np.ones(G)
    dtm = -np.ones(D)
    for didx in range(D):
        best_iou = iou_thres
        m = -1
        for gidx in range(G):
            if gtm[gidx] >= 0:
                continue
            if ious[didx, gidx] < best_iou:
                continue
            best_iou = ious[didx, gidx]
            m = gidx
        if m == -1:
            continue
        gtm[m] = didx
        dtm[didx] = m
    return dtm, gtm


def gather_dt(boxes, probs, labels, eval_target: Dict, targetid2class: Dict,
              tococo: bool = False, coco_class_names=None) -> Dict:
    """Detector output (xyxy) -> per-eval-class list of (xywh box, prob)
    (utils.py:436-471)."""
    target_dt_boxes = {one: [] for one in eval_target}
    for box, prob, label in zip(boxes, probs, labels):
        box = list(box)
        box[2] -= box[0]
        box[3] -= box[1]
        if tococo:
            cat_name = coco_class_names[int(label)]
            target_class = None
            for t in eval_target:
                if cat_name in eval_target[t]:
                    target_class = t
        else:
            cat_name = targetid2class[int(label)]
            target_class = cat_name if cat_name in eval_target else None
        if target_class is None:
            continue
        target_dt_boxes[target_class].append(
            ([float(round(x, 2)) for x in box], float(round(prob, 4))))
    return target_dt_boxes


def gather_gt(anno_boxes, anno_labels, eval_target: Dict,
              targetid2class: Dict) -> Dict:
    gt_boxes = {one: [] for one in eval_target}
    for box, label in zip(anno_boxes, anno_labels):
        name = targetid2class[int(label)]
        if name in eval_target:
            b = [float(round(x, 1)) for x in box]
            b[2] -= b[0]
            b[3] -= b[1]
            gt_boxes[name].append(b)
    return gt_boxes


def match_dt_gt(e: Dict, imgid, target_dt_boxes: Dict, gt_boxes: Dict,
                eval_target: Dict):
    """Accumulate one image's matches into e[class][imgid]
    (utils.py:529-548)."""
    for target_class in eval_target:
        dts = sorted(target_dt_boxes[target_class], key=lambda x: -x[1])
        d = [box for box, prob in dts]
        dscores = [prob for box, prob in dts]
        g = gt_boxes[target_class]
        dm, _ = match_detection(d, g, iou_xywh(d, g), iou_thres=0.5)
        e[target_class][imgid] = {
            "dscores": dscores, "dm": dm, "gt_num": len(g)}


def computeAP_v2(dm: np.ndarray, total_gt: int) -> float:
    rels = 0
    score = 0.0
    for rank, one in enumerate(dm, 1):
        if one >= 0:
            rels += 1
            score += rels / float(rank)
    return score / float(total_gt) if total_gt else score


def computeAR_2(dm: np.ndarray, num_gt: int) -> float:
    if num_gt == 0:
        return 1.0
    return sum(1 for one in dm if one >= 0) / float(num_gt)


def aggregate_eval(e: Dict, maxDet: int = 100
                   ) -> Tuple[Dict[str, float], Dict[str, float]]:
    aps, ars = {}, {}
    for catId in e:
        e_c = e[catId]
        dscores = np.concatenate(
            [np.asarray(e_c[i]["dscores"][:maxDet]) for i in e_c]
            or [np.zeros(0)])
        inds = np.argsort(-dscores, kind="mergesort")
        dm = np.concatenate(
            [np.asarray(e_c[i]["dm"][:maxDet]) for i in e_c]
            or [np.zeros(0)])[inds]
        num_gt = int(np.sum([e_c[i]["gt_num"] for i in e_c]))
        aps[catId] = computeAP_v2(dm, num_gt)
        ars[catId] = computeAR_2(dm, num_gt)
    return aps, ars


def weighted_average(aps: Dict, ars: Dict,
                     eval_target_weight: Optional[Dict] = None):
    if eval_target_weight is not None:
        return (sum(aps[c] * eval_target_weight[c] for c in aps),
                sum(ars[c] * eval_target_weight[c] for c in ars))
    return (sum(aps.values()) / float(len(aps)),
            sum(ars.values()) / float(len(ars)))
