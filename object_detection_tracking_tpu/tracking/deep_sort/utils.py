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


def link_tracklets(track_data: np.ndarray, id_feats: Dict[int, np.ndarray],
                   max_gap: int = 40, max_feat_dist: float = 0.3,
                   max_speed: float = 1.0, frame_gap: int = 1) -> np.ndarray:
    """Offline tracklet linking: heal id breaks after the video ends.

    An occlusion can shift the detector's box abruptly enough to fail
    both the Mahalanobis gate and the IOU stage for one frame; online
    Deep SORT then spawns a duplicate track that wins the matching
    cascade forever after (lower time_since_update = higher cascade
    priority), permanently splitting the identity. Online revival was
    measured to fight the cascade (id churn on active tracks); linking
    the finished tracklets offline — the StrongSORT/AFLink recipe — is
    strictly safer because full spans and whole-life appearance means
    are known. The reference has no equivalent (its interpolation pass,
    deep_sort/utils.py:48-91, only fills gaps *within* an id); this is
    a first-party extension, opt-in via --link_tracklets.

    The unit of linking is the contiguous SEGMENT, not the whole id: an
    id whose rows have an internal gap > 10 frames is split first. This
    heals the interleaved pattern online trackers produce — track A
    loses the object, track B covers it for a while, then A re-activates
    and steals it back (A's whole-id span then overlaps B's, so whole-id
    linking can never merge them; A's two segments and B's one chain
    fine). Same-id segments re-link to themselves at appearance
    distance 0, so the split is a no-op for ids that were never stolen
    from.

    track_data rows: [frame, id, x, y, w, h] (MOT-style). id_feats:
    {track_id: mean appearance feature} from Tracker.feature_archive().
    A pair (a ends, b starts) is linkable when b starts 1..max_gap
    frames after a ends, the cosine distance of their ids' mean
    appearances is <= max_feat_dist, and the implied straight-line speed
    across the gap is <= max_speed box-diagonals/frame (objects can
    bounce, so no velocity extrapolation — just a teleport guard).
    Pairs are linked greedily by ascending appearance distance; chains
    compose; each chain takes its root segment's id. Rows that would
    duplicate a (frame, id) pair after relabeling are dropped.

    ``frame_gap``: detection stride of the caller (rows are frame_gap
    frames apart). seg_split and max_gap are defined in *detection
    steps* and scaled here — without this, frame_gap > seg_split made
    every row its own segment (O(n^2) candidate pairs + per-row greedy
    linking; ADVICE r4)."""
    if track_data.shape[0] == 0:
        return track_data
    frame_gap = max(int(frame_gap), 1)
    seg_split = 10 * frame_gap
    max_gap = max_gap * frame_gap
    ids = track_data[:, 1].astype(np.int64)
    feats = {}
    for tid in np.unique(ids):
        feat = id_feats.get(int(tid))
        if feat is not None:
            n = np.linalg.norm(feat)
            feat = feat / n if n > 0 else None
        feats[int(tid)] = feat
    segs = []        # dicts: tid, f0, f1, b0, b1, rows (row indices)
    order = np.lexsort((track_data[:, 0],))
    for tid in np.unique(ids):
        ridx = order[ids[order] == tid]
        frames = track_data[ridx, 0]
        cut = np.flatnonzero(np.diff(frames) > seg_split)
        for lo, hi in zip(np.r_[0, cut + 1], np.r_[cut, len(ridx) - 1]):
            segs.append(dict(
                tid=int(tid), rows=ridx[lo:hi + 1],
                f0=int(frames[lo]), f1=int(frames[hi]),
                b0=track_data[ridx[lo], 2:6], b1=track_data[ridx[hi], 2:6]))
    cands = []
    for i, a in enumerate(segs):
        fa = feats[a["tid"]]
        if fa is None:
            continue
        for j, b in enumerate(segs):
            fb = feats[b["tid"]]
            if j == i or fb is None:
                continue
            gap = b["f0"] - a["f1"]
            if not (1 <= gap <= max_gap):
                continue
            fdist = 0.0 if a["tid"] == b["tid"] \
                else 1.0 - float(np.dot(fa, fb))
            if fdist > max_feat_dist:
                continue
            ca = a["b1"][:2] + 0.5 * a["b1"][2:4]
            cb = b["b0"][:2] + 0.5 * b["b0"][2:4]
            diag = float(np.hypot(*a["b1"][2:4]))
            if np.hypot(*(cb - ca)) > max_speed * max(gap, 1) * diag:
                continue
            cands.append((fdist, i, j))
    # greedy: each segment links to at most one successor/predecessor
    cands.sort()
    succ_used, pred_used, parent = set(), set(), {}
    for _, i, j in cands:
        if i in succ_used or j in pred_used:
            continue
        succ_used.add(i)
        pred_used.add(j)
        parent[j] = i

    def root(s):
        while s in parent:
            s = parent[s]
        return s

    new_id = np.empty(track_data.shape[0], np.int64)
    for i, seg in enumerate(segs):
        new_id[seg["rows"]] = segs[root(i)]["tid"]
    if np.array_equal(new_id, ids):
        return track_data
    out = track_data.copy()
    out[:, 1] = new_id
    out = out[np.lexsort((out[:, 1], out[:, 0]))]
    # safety: chains are temporally disjoint by construction, but two
    # unlinked same-id chains could in principle collide — keep first
    _, keep = np.unique(out[:, :2].astype(np.int64), axis=0,
                        return_index=True)
    return out[np.sort(keep)]


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
