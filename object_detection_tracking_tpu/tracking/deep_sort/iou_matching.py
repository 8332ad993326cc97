"""IOU cost for short-gap association (reference deep_sort/iou_matching.py)."""

from __future__ import annotations

import numpy as np

from ...ops.boxes import pairwise_iou_np, tlwh_to_xyxy
from .nn_matching import INFTY_COST


def iou_cost(tracks, detections, track_indices=None, detection_indices=None):
    if track_indices is None:
        track_indices = np.arange(len(tracks))
    if detection_indices is None:
        detection_indices = np.arange(len(detections))

    cost = np.zeros((len(track_indices), len(detection_indices)), np.float32)
    det_boxes = tlwh_to_xyxy(
        np.array([detections[i].tlwh for i in detection_indices]))
    for row, tidx in enumerate(track_indices):
        if tracks[tidx].time_since_update > 1:
            cost[row, :] = INFTY_COST
            continue
        tb = tlwh_to_xyxy(tracks[tidx].to_tlwh()[None])
        cost[row, :] = 1.0 - pairwise_iou_np(tb, det_boxes)[0]
    return cost
