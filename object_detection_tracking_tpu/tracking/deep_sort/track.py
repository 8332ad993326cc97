"""Deep SORT track lifecycle.

Behavioral parity with the reference's track state machine
(deep_sort/track.py:4-166): a track is born Tentative, promotes to
Confirmed after ``n_init`` consecutive hits, and dies on its first miss
while Tentative or after ``max_age`` consecutive misses once Confirmed.
Box geometry lives in the Kalman state as (center-x, center-y, aspect,
height) + velocities; this class only converts formats and advances the
lifecycle counters — the tracker drives the (batched) Kalman math.
"""

from __future__ import annotations

import enum
from typing import List, Optional

import numpy as np


class TrackState(enum.IntEnum):
    Tentative = 1
    Confirmed = 2
    Deleted = 3


class Track:
    """One tracked target: Kalman state + lifecycle counters.

    Attributes the tracker reads/writes directly: ``mean`` /
    ``covariance`` (rewritten wholesale by the batched predict),
    ``features`` (appearance gallery staging, drained into the metric
    each frame), ``age`` / ``time_since_update`` (incremented by the
    batched predict), ``hits``, ``track_id``.
    """

    __slots__ = ("mean", "covariance", "track_id", "hits", "age",
                 "time_since_update", "state", "features",
                 "feat_sum", "feat_n", "_n_init", "_max_age")

    def __init__(self, mean: np.ndarray, covariance: np.ndarray,
                 track_id: int, n_init: int, max_age: int,
                 feature: Optional[np.ndarray] = None):
        self.mean = mean
        self.covariance = covariance
        self.track_id = track_id
        self._n_init = n_init
        self._max_age = max_age
        self.hits = 1
        self.age = 1
        self.time_since_update = 0
        # Always born Tentative — even with n_init=1 a track confirms on
        # its first *update*, not at creation (the CLI's fresh-track
        # output path depends on this one-frame lag).
        self.state = TrackState.Tentative
        self.features: List[np.ndarray] = []
        # running mean appearance over the track's whole life — the
        # gallery (``features``) is drained into the metric every frame,
        # so offline tracklet linking needs its own accumulator
        self.feat_sum: Optional[np.ndarray] = None
        self.feat_n = 0
        if feature is not None:
            feature = np.asarray(feature, np.float32)
            self.features.append(feature)
            self.feat_sum = feature.copy()
            self.feat_n = 1

    # -- geometry ------------------------------------------------------

    def to_tlwh(self) -> np.ndarray:
        """Current state as (top-left-x, top-left-y, width, height)."""
        cx, cy, aspect, h = self.mean[:4]
        w = aspect * h
        return np.asarray([cx - 0.5 * w, cy - 0.5 * h, w, h])

    def to_tlbr(self) -> np.ndarray:
        """Current state as (x1, y1, x2, y2)."""
        x, y, w, h = self.to_tlwh()
        return np.asarray([x, y, x + w, y + h])

    # -- lifecycle -----------------------------------------------------

    def predict(self, kf) -> None:
        """Single-track motion step. The tracker normally advances all
        tracks with one batched ``kf.multi_predict``; this exists for
        callers stepping one track in isolation."""
        self.mean, self.covariance = kf.predict(self.mean, self.covariance)
        self.age += 1
        self.time_since_update += 1

    def update(self, kf, detection) -> None:
        """Fold a matched detection into the Kalman state, stage its
        appearance feature, and promote Tentative -> Confirmed once the
        hit streak reaches ``n_init``."""
        self.mean, self.covariance = kf.update(
            self.mean, self.covariance, detection.to_xyah())
        self.features.append(detection.feature)
        feat = np.asarray(detection.feature, np.float32)
        if self.feat_sum is None:
            self.feat_sum = feat.copy()
        else:
            self.feat_sum += feat
        self.feat_n += 1
        self.hits += 1
        self.time_since_update = 0
        if self.state is TrackState.Tentative and self.hits >= self._n_init:
            self.state = TrackState.Confirmed

    def mark_missed(self) -> None:
        """Called when no detection matched this frame: an unconfirmed
        track dies immediately; a confirmed one survives ``max_age``
        consecutive misses."""
        dead = (self.state is TrackState.Tentative
                or self.time_since_update > self._max_age)
        if dead:
            self.state = TrackState.Deleted

    # -- predicates ----------------------------------------------------

    def is_tentative(self) -> bool:
        return self.state is TrackState.Tentative

    def is_confirmed(self) -> bool:
        return self.state is TrackState.Confirmed

    def is_deleted(self) -> bool:
        return self.state is TrackState.Deleted
