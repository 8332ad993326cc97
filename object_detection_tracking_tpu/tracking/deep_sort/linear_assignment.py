"""Hungarian matching + matching cascade + Mahalanobis gate
(reference deep_sort/linear_assignment.py).

Assignment uses the native lapjv solver when built (tracking/assignment.py),
falling back to scipy."""

from __future__ import annotations

from typing import Callable

import numpy as np

from ..assignment import linear_sum_assignment
from ..kalman import chi2inv95
from .nn_matching import INFTY_COST

GATED_COST = INFTY_COST


def min_cost_matching(distance_metric: Callable, max_distance: float,
                      tracks, detections,
                      track_indices=None, detection_indices=None):
    if track_indices is None:
        track_indices = list(range(len(tracks)))
    if detection_indices is None:
        detection_indices = list(range(len(detections)))
    if not detection_indices or not track_indices:
        return [], track_indices, detection_indices

    cost = distance_metric(tracks, detections, track_indices,
                           detection_indices)
    cost = np.where(cost > max_distance, max_distance + 1e-5, cost)
    rows, cols = linear_sum_assignment(cost)

    matches, unmatched_tracks, unmatched_dets = [], [], []
    matched_rows = set(rows.tolist())
    matched_cols = set(cols.tolist())
    for r, tidx in enumerate(track_indices):
        if r not in matched_rows:
            unmatched_tracks.append(tidx)
    for c, didx in enumerate(detection_indices):
        if c not in matched_cols:
            unmatched_dets.append(didx)
    for r, c in zip(rows, cols):
        tidx, didx = track_indices[r], detection_indices[c]
        if cost[r, c] > max_distance:
            unmatched_tracks.append(tidx)
            unmatched_dets.append(didx)
        else:
            matches.append((tidx, didx))
    return matches, unmatched_tracks, unmatched_dets


def matching_cascade(distance_metric: Callable, max_distance: float,
                     cascade_depth: int, tracks, detections,
                     track_indices=None, detection_indices=None):
    """Match tracks level by level of time_since_update, freshest first."""
    if track_indices is None:
        track_indices = list(range(len(tracks)))
    if detection_indices is None:
        detection_indices = list(range(len(detections)))

    unmatched_dets = list(detection_indices)
    matches = []
    # group tracks by age once: scanning all tracks per level was
    # O(cascade_depth * T) per update and dominated with ~100 tracks
    by_age = {}
    for t in track_indices:
        by_age.setdefault(tracks[t].time_since_update, []).append(t)
    for age in sorted(a for a in by_age if 1 <= a <= cascade_depth):
        if not unmatched_dets:
            break
        m, _, unmatched_dets = min_cost_matching(
            distance_metric, max_distance, tracks, detections,
            by_age[age], unmatched_dets)
        matches += m
    matched_track_ids = {t for t, _ in matches}
    unmatched_tracks = [t for t in track_indices if t not in matched_track_ids]
    return matches, unmatched_tracks, unmatched_dets


def gate_cost_matrix(kf, cost_matrix: np.ndarray, tracks, detections,
                     track_indices, detection_indices,
                     gated_cost: float = GATED_COST,
                     only_position: bool = False) -> np.ndarray:
    """Set cost to infinity where the detection is outside the track's
    chi-square 0.95 Mahalanobis gate."""
    gating_dim = 2 if only_position else 4
    gating_threshold = chi2inv95[gating_dim]
    measurements = np.asarray(
        [detections[i].to_xyah() for i in detection_indices])
    means = np.stack([tracks[t].mean for t in track_indices])
    covs = np.stack([tracks[t].covariance for t in track_indices])
    d = kf.gating_distance_multi(means, covs, measurements, only_position)
    cost_matrix[d > gating_threshold] = gated_cost
    return cost_matrix
