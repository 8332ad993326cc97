"""compute_distance_matrix semantics (ref torchreid/distance.py:6-67)."""

import numpy as np

from object_detection_tracking_tpu.models.reid.extractor import (
    compute_distance_matrix)


def test_euclidean_is_squared_distance():
    rng = np.random.RandomState(0)
    a = rng.randn(4, 16).astype(np.float32)
    b = rng.randn(6, 16).astype(np.float32)
    d = compute_distance_matrix(a, b, "euclidean")
    ref = ((a[:, None] - b[None]) ** 2).sum(-1)
    assert d.shape == (4, 6)
    assert np.allclose(d, ref, atol=1e-4)


def test_cosine_range_and_self_zero():
    rng = np.random.RandomState(1)
    a = rng.randn(5, 8).astype(np.float32)
    d = compute_distance_matrix(a, a, "cosine")
    assert np.allclose(np.diag(d), 0.0, atol=1e-6)
    assert (d >= -1e-6).all() and (d <= 2.0 + 1e-6).all()
    # scale invariance
    d2 = compute_distance_matrix(3.0 * a, a, "cosine")
    assert np.allclose(d, d2, atol=1e-5)
