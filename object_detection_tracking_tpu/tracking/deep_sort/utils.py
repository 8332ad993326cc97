"""Detector-output -> tracker glue + track post-processing.

Reference deep_sort/utils.py: create_obj_infos (:5-44), linear_inter_bbox
(:48-91), filter_short_objs (:95-113). Here the detector already pools the
7x7x256 box features on device, so create_obj_infos is a cheap repack.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .detection import Detection


def create_obj_infos(boxes_xyxy: np.ndarray, labels: np.ndarray,
                     probs: np.ndarray, feats: np.ndarray,
                     valid: np.ndarray, target_class_id: int,
                     min_confidence: float = 0.85,
                     min_detection_height: float = 0.0) -> List[Detection]:
    """Select one class's detections and wrap them for the tracker.

    boxes_xyxy [R, 4], labels [R], probs [R], feats [R, C] (pooled),
    valid [R]."""
    sel = valid & (labels == target_class_id) & (probs >= min_confidence)
    dets = []
    for i in np.flatnonzero(sel):
        x1, y1, x2, y2 = boxes_xyxy[i]
        tlwh = np.array([x1, y1, x2 - x1, y2 - y1], np.float32)
        if tlwh[3] < min_detection_height:
            continue
        dets.append(Detection(tlwh, probs[i], feats[i]))
    return dets


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
