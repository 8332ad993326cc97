import numpy as np
import scipy.optimize

from object_detection_tracking_tpu.tracking import assignment as A


def test_native_lapjv_matches_scipy_optimal_cost():
    lib = A._load_native()
    assert lib is not None, "native lapjv failed to build"
    for seed in range(20):
        rng = np.random.RandomState(seed)
        n = rng.randint(8, 40)
        cost = rng.rand(n, n) * 10
        rows, cols = A.linear_sum_assignment(cost)
        got = cost[rows, cols].sum()
        r2, c2 = scipy.optimize.linear_sum_assignment(cost)
        want = cost[r2, c2].sum()
        # both must be optimal
        np.testing.assert_allclose(got, want, atol=1e-9)
        # valid permutation
        assert sorted(cols.tolist()) == list(range(n))


def test_rectangular_falls_back_to_scipy():
    rng = np.random.RandomState(0)
    cost = rng.rand(5, 9)
    rows, cols = A.linear_sum_assignment(cost)
    r2, c2 = scipy.optimize.linear_sum_assignment(cost)
    np.testing.assert_allclose(cost[rows, cols].sum(), cost[r2, c2].sum())


def test_lapjv_extended_cost_limit():
    # two obvious matches + one pair above the cost limit -> unmatched
    cost = np.array([
        [0.1, 9.0, 9.0],
        [9.0, 0.2, 9.0],
        [9.0, 9.0, 5.0],
    ])
    x, y = A.lapjv_extended(cost, cost_limit=1.0)
    assert x[0] == 0 and x[1] == 1 and x[2] == -1
    assert y[0] == 0 and y[1] == 1 and y[2] == -1


def test_lapjv_extended_rectangular():
    cost = np.array([[0.5, 0.1], [0.2, 0.4], [0.9, 0.8]])
    x, y = A.lapjv_extended(cost, cost_limit=1.0)
    # 3 rows, 2 cols: at most 2 matches
    assert (x >= 0).sum() == (y >= 0).sum() <= 2
    for i, j in enumerate(x):
        if j >= 0:
            assert y[j] == i
