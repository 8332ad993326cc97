"""Detector-output -> tracker glue + track post-processing.

Reference deep_sort/utils.py: create_obj_infos (:5-44), linear_inter_bbox
(:48-91), filter_short_objs (:95-113). Here the detector already pools the
7x7x256 box features on device, so create_obj_infos is a cheap repack.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from .detection import Detection


def create_obj_infos(boxes_xyxy: np.ndarray, labels: np.ndarray,
                     probs: np.ndarray, feats: np.ndarray,
                     valid: np.ndarray, classid2name: Dict[int, str],
                     tracking_obj: str, scale: float = 1.0,
                     min_confidence: float = 0.85,
                     min_detection_height: float = 0.0,
                     coco_to_actev: Dict[str, str] = None
                     ) -> List[Detection]:
    """Select one tracked class's detections and wrap them for the tracker
    (reference deep_sort/utils.py:5-44): boxes scaled back to original frame
    coords, optional COCO->ActEV class-name mapping, confidence and height
    filters. feats [R, C] are the on-device-pooled embeddings."""
    idx = np.flatnonzero(valid)
    if idx.size == 0:
        return []
    # vectorized row filter (the per-row Python loop was hot at ~55
    # detections/frame x 2 trackers); class names resolve per UNIQUE label
    labels_v = labels[idx].astype(np.int64)
    keep_label = np.zeros(idx.size, bool)
    for lab in np.unique(labels_v):
        cat_name = classid2name.get(int(lab))
        if cat_name is not None and coco_to_actev is not None:
            cat_name = coco_to_actev.get(cat_name)
        keep_label[labels_v == lab] = (cat_name == tracking_obj)
    conf = np.round(probs[idx].astype(np.float64), 7)
    b = boxes_xyxy[idx].astype(np.float32) / scale
    w = b[:, 2] - b[:, 0]
    h = b[:, 3] - b[:, 1]
    # Degenerate boxes (zero/negative extent) would divide-by-zero in
    # Detection.to_xyah and poison the Kalman state with NaNs; the
    # reference only gates height (deep_sort/utils.py:30), we hard-filter
    # both extents.
    keep = (keep_label & (conf >= min_confidence) & (w > 0.0) & (h > 0.0)
            & (h >= min_detection_height))
    rows = idx[keep]
    tlwh = np.stack([b[keep, 0], b[keep, 1], w[keep], h[keep]], axis=1)
    confs = conf[keep]
    return [Detection(tlwh[k], float(confs[k]), feats[i])
            for k, i in enumerate(rows)]


def det_level_nms(detections: List[Detection],
                  max_overlap: float) -> List[Detection]:
    """Detection-level greedy suppression before the tracker update
    (application_util/preprocessing.py:6-73). Note the classic ROI-overlap
    convention: intersection / candidate-area with the +1 pixel sizes."""
    if max_overlap >= 1.0 or len(detections) <= 1:
        return detections
    boxes = np.array([d.tlwh for d in detections], np.float32)
    scores = np.array([d.confidence for d in detections], np.float32)
    x1, y1 = boxes[:, 0], boxes[:, 1]
    x2, y2 = boxes[:, 0] + boxes[:, 2], boxes[:, 1] + boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    idxs = np.argsort(scores)
    pick = []
    while len(idxs) > 0:
        i = idxs[-1]
        pick.append(i)
        xx1 = np.maximum(x1[i], x1[idxs[:-1]])
        yy1 = np.maximum(y1[i], y1[idxs[:-1]])
        xx2 = np.minimum(x2[i], x2[idxs[:-1]])
        yy2 = np.minimum(y2[i], y2[idxs[:-1]])
        w = np.maximum(0, xx2 - xx1 + 1)
        h = np.maximum(0, yy2 - yy1 + 1)
        overlap = (w * h) / area[idxs[:-1]]
        idxs = idxs[:-1][overlap <= max_overlap]
    return [detections[i] for i in pick]


def linear_inter_bbox(track_data: np.ndarray,
                      frame_gap: int) -> np.ndarray:
    """Fill skipped frames by linear interpolation per track id.

    track_data rows: [frame_idx, track_id, x, y, w, h] (MOT-style). Gaps up
    to 10 * frame_gap are filled (deep_sort/utils.py:48-91)."""
    if track_data.shape[0] == 0:
        return track_data
    obj_indices = track_data[:, 1].astype(np.int64)
    rows = [track_data]
    for obj_id in np.unique(obj_indices):
        mask = obj_indices == obj_id
        tracklet = track_data[mask]
        order = np.argsort(tracklet[:, 0])
        tracklet = tracklet[order]
        frames = tracklet[:, 0]
        for i in range(len(tracklet) - 1):
            f0, f1 = int(frames[i]), int(frames[i + 1])
            gap = f1 - f0
            if gap <= 1 or gap > frame_gap * 10:
                continue
            b0 = tracklet[i, 2:6]
            b1 = tracklet[i + 1, 2:6]
            for f in range(f0 + 1, f1):
                a = (f - f0) / gap
                box = b0 * (1 - a) + b1 * a
                rows.append(np.concatenate(
                    [[f, obj_id], box])[None].astype(track_data.dtype))
    out = np.concatenate(rows, axis=0)
    return out[np.lexsort((out[:, 1], out[:, 0]))]


def filter_short_objs(track_data: np.ndarray,
                      min_frames: int = 2) -> np.ndarray:
    """Drop track ids observed in fewer than ``min_frames`` frames
    (deep_sort/utils.py:95-113)."""
    if track_data.shape[0] == 0:
        return track_data
    ids, counts = np.unique(track_data[:, 1].astype(np.int64),
                            return_counts=True)
    bad = set(ids[counts < min_frames].tolist())
    keep = np.array([int(r[1]) not in bad for r in track_data], bool)
    return track_data[keep]
