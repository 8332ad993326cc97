"""Constant-velocity Kalman filter over (cx, cy, aspect, height) box state.

Same filter family as the reference trackers (deep_sort/kalman_filter.py,
tmot/kalman_filter.py): 8-dim state [x, y, a, h, vx, vy, va, vh], with
measurement noise scaled by box height. Includes a batched ``multi_predict``
(the TMOT vectorization) used by both trackers here.
"""

from __future__ import annotations


import numpy as np
import scipy.linalg

# 0.95-quantile of chi-square per dof, for Mahalanobis gating
chi2inv95 = {
    1: 3.8415, 2: 5.9915, 3: 7.8147, 4: 9.4877,
    5: 11.070, 6: 12.592, 7: 14.067, 8: 15.507,
}


class KalmanFilter:
    def __init__(self):
        ndim, dt = 4, 1.0
        self._F = np.eye(2 * ndim)
        for i in range(ndim):
            self._F[i, ndim + i] = dt
        self._H = np.eye(ndim, 2 * ndim)
        # uncertainty weights relative to box height
        self._std_pos = 1.0 / 20
        self._std_vel = 1.0 / 160

    def initiate(self, measurement: np.ndarray):
        """measurement: (cx, cy, a, h) -> (mean [8], cov [8, 8])."""
        mean = np.r_[measurement, np.zeros(4)]
        h = measurement[3]
        std = [2 * self._std_pos * h, 2 * self._std_pos * h,
               1e-2, 2 * self._std_pos * h,
               10 * self._std_vel * h, 10 * self._std_vel * h,
               1e-5, 10 * self._std_vel * h]
        cov = np.diag(np.square(std))
        return mean, cov

    def _motion_cov(self, mean: np.ndarray) -> np.ndarray:
        h = mean[3]
        std = [self._std_pos * h, self._std_pos * h, 1e-2, self._std_pos * h,
               self._std_vel * h, self._std_vel * h, 1e-5, self._std_vel * h]
        return np.diag(np.square(std))

    def predict(self, mean, cov):
        q = self._motion_cov(mean)
        mean = self._F @ mean
        cov = self._F @ cov @ self._F.T + q
        return mean, cov

    def multi_predict(self, means: np.ndarray, covs: np.ndarray):
        """Vectorized predict over N tracks: means [N, 8], covs [N, 8, 8]
        (tmot/kalman_filter.py:154)."""
        if len(means) == 0:
            return means, covs
        h = means[:, 3]
        sp, sv = self._std_pos * h, self._std_vel * h
        std = np.stack([sp, sp, np.full_like(sp, 1e-2), sp,
                        sv, sv, np.full_like(sv, 1e-5), sv], axis=1)
        q = np.einsum("ni,ij->nij", np.square(std), np.eye(8))
        means = means @ self._F.T
        covs = self._F @ covs @ self._F.T + q
        return means, covs

    def project(self, mean, cov):
        h = mean[3]
        std = [self._std_pos * h, self._std_pos * h, 1e-1, self._std_pos * h]
        r = np.diag(np.square(std))
        pm = self._H @ mean
        pc = self._H @ cov @ self._H.T + r
        return pm, pc

    def update(self, mean, cov, measurement):
        pm, pc = self.project(mean, cov)
        chol, lower = scipy.linalg.cho_factor(pc, lower=True,
                                              check_finite=False)
        gain = scipy.linalg.cho_solve(
            (chol, lower), (cov @ self._H.T).T, check_finite=False).T
        innovation = measurement - pm
        new_mean = mean + gain @ innovation
        new_cov = cov - gain @ pc @ gain.T
        return new_mean, new_cov

    def gating_distance(self, mean, cov, measurements: np.ndarray,
                        only_position: bool = False,
                        metric: str = "maha") -> np.ndarray:
        """Squared Mahalanobis (or gaussian) distance from the projected
        state to each (cx, cy, a, h) measurement row."""
        pm, pc = self.project(mean, cov)
        if only_position:
            pm, pc = pm[:2], pc[:2, :2]
            measurements = measurements[:, :2]
        d = measurements - pm
        if metric == "gaussian":
            return np.sum(d * d, axis=1)
        chol = np.linalg.cholesky(pc)
        z = scipy.linalg.solve_triangular(
            chol, d.T, lower=True, check_finite=False, overwrite_b=True)
        return np.sum(z * z, axis=0)

    def gating_distance_multi(self, means: np.ndarray, covs: np.ndarray,
                              measurements: np.ndarray,
                              only_position: bool = False) -> np.ndarray:
        """Batched squared Mahalanobis: [T, 8] means x [N, 4] measurements
        -> [T, N]. Same math as per-track ``gating_distance`` but one
        batched Cholesky + solve for all tracks (the per-track Python
        loop dominated the host tracking cost at ~100 live tracks)."""
        T = len(means)
        if T == 0 or len(measurements) == 0:
            return np.zeros((T, len(measurements)), np.float32)
        h = means[:, 3]
        std = np.stack([self._std_pos * h, self._std_pos * h,
                        np.full_like(h, 1e-1), self._std_pos * h], axis=1)
        pm = means[:, :4].copy()                       # H @ mean
        pc = covs[:, :4, :4] + \
            np.square(std)[:, :, None] * np.eye(4)[None]
        k = 2 if only_position else 4
        d = measurements[None, :, :k] - pm[:, None, :k]   # [T, N, k]
        L = np.linalg.cholesky(pc[:, :k, :k])             # [T, k, k]
        # batched lower-triangular solve (np.linalg.solve batches; for
        # k<=4 the general LU is as exact as solve_triangular)
        z = np.linalg.solve(L, d.transpose(0, 2, 1))      # [T, k, N]
        return np.sum(z * z, axis=1)
