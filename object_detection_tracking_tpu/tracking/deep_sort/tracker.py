"""Deep SORT tracker: matching cascade on appearance (Mahalanobis-gated),
IOU fallback for fresh tracks (reference deep_sort/tracker.py, defaults at
tracker.py:40: max_iou_distance=0.5, max_age=60, n_init=1)."""

from __future__ import annotations

from typing import List

import numpy as np

from ..kalman import KalmanFilter
from . import iou_matching, linear_assignment
from .track import Track


class Tracker:
    def __init__(self, metric, max_iou_distance: float = 0.5,
                 max_age: int = 60, n_init: int = 1):
        self.metric = metric
        self.max_iou_distance = max_iou_distance
        self.max_age = max_age
        self.n_init = n_init
        self.kf = KalmanFilter()
        self.tracks: List[Track] = []
        # {track_id: mean appearance feature} of finished tracks, kept
        # for offline tracklet linking (utils.link_tracklets)
        self.archive = {}
        self._next_id = 1

    def predict(self):
        if not self.tracks:
            return
        # one batched predict for all tracks (kalman.multi_predict) —
        # numerically identical to per-track kf.predict
        means = np.stack([t.mean for t in self.tracks])
        covs = np.stack([t.covariance for t in self.tracks])
        means, covs = self.kf.multi_predict(means, covs)
        for i, track in enumerate(self.tracks):
            track.mean = means[i]
            track.covariance = covs[i]
            track.age += 1
            track.time_since_update += 1

    def update(self, detections):
        matches, unmatched_tracks, unmatched_dets = self._match(detections)

        for tidx, didx in matches:
            self.tracks[tidx].update(self.kf, detections[didx])
        for tidx in unmatched_tracks:
            self.tracks[tidx].mark_missed()
        for didx in unmatched_dets:
            self._initiate_track(detections[didx])
        for t in self.tracks:
            if t.is_deleted():
                self._archive(t)
        self.tracks = [t for t in self.tracks if not t.is_deleted()]

        # refresh the appearance gallery
        active_targets = [t.track_id for t in self.tracks if t.is_confirmed()]
        features, targets = [], []
        for track in self.tracks:
            if not track.is_confirmed():
                continue
            features += track.features
            targets += [track.track_id] * len(track.features)
            track.features = []
        self.metric.partial_fit(
            np.asarray(features) if features else np.zeros((0, 1)),
            targets, active_targets)

    def _match(self, detections):
        confirmed = [i for i, t in enumerate(self.tracks) if t.is_confirmed()]
        unconfirmed = [i for i, t in enumerate(self.tracks)
                       if not t.is_confirmed()]

        # The gated appearance cost of a (track, detection) pair does not
        # depend on which other pairs remain, so compute the FULL
        # confirmed x detections matrix ONCE and let the cascade levels
        # slice it — the cascade used to recompute distance+gate per age
        # level (~18 small metric calls per frame with many live tracks).
        full_cost = None
        row_of = {t: r for r, t in enumerate(confirmed)}
        if confirmed and detections:
            feats = np.asarray([d.feature for d in detections])
            targets = [self.tracks[i].track_id for i in confirmed]
            full_cost = self.metric.distance(feats, targets)
            full_cost = linear_assignment.gate_cost_matrix(
                self.kf, full_cost, self.tracks, detections, confirmed,
                list(range(len(detections))))

        def gated_metric(tracks, dets, track_indices, detection_indices):
            return full_cost[np.ix_([row_of[t] for t in track_indices],
                                    detection_indices)]

        # 1) appearance cascade over confirmed tracks
        matches_a, unmatched_a, unmatched_dets = \
            linear_assignment.matching_cascade(
                gated_metric, self.metric.matching_threshold, self.max_age,
                self.tracks, detections, confirmed)

        # 2) IOU matching for unconfirmed + just-missed confirmed tracks
        iou_candidates = unconfirmed + [
            i for i in unmatched_a if self.tracks[i].time_since_update == 1]
        unmatched_a = [
            i for i in unmatched_a if self.tracks[i].time_since_update != 1]
        matches_b, unmatched_b, unmatched_dets = \
            linear_assignment.min_cost_matching(
                iou_matching.iou_cost, self.max_iou_distance, self.tracks,
                detections, iou_candidates, unmatched_dets)

        return (matches_a + matches_b, unmatched_a + unmatched_b,
                unmatched_dets)

    def _archive(self, track) -> None:
        """Record a finished track's identity summary for offline
        tracklet linking (utils.link_tracklets): mean appearance over
        its matched detections + its span endpoints."""
        if track.feat_sum is not None and track.feat_n > 0:
            self.archive[track.track_id] = track.feat_sum / track.feat_n

    def feature_archive(self):
        """{track_id: mean appearance feature} over ALL tracks this
        tracker has ever confirmed (dead tracks included)."""
        for t in self.tracks:
            self._archive(t)
        return dict(self.archive)

    def _initiate_track(self, detection):
        mean, cov = self.kf.initiate(detection.to_xyah())
        self.tracks.append(Track(
            mean, cov, self._next_id, self.n_init, self.max_age,
            detection.feature))
        self._next_id += 1
