import numpy as np

from object_detection_tracking_tpu.tracking.deep_sort import (
    Detection, Tracker, create_obj_infos, filter_short_objs,
    linear_inter_bbox)
from object_detection_tracking_tpu.tracking.deep_sort.nn_matching import (
    NearestNeighborDistanceMetric)
from object_detection_tracking_tpu.tracking.kalman import KalmanFilter


def make_det(x, y, w=20, h=40, feat=None, conf=0.95):
    if feat is None:
        feat = np.ones(8, np.float32)
    return Detection([x, y, w, h], conf, feat)


def test_kalman_roundtrip():
    kf = KalmanFilter()
    mean, cov = kf.initiate(np.array([50.0, 60.0, 0.5, 40.0]))
    mean, cov = kf.predict(mean, cov)
    mean, cov = kf.update(mean, cov, np.array([52.0, 62.0, 0.5, 40.0]))
    assert abs(mean[0] - 51) < 2 and abs(mean[1] - 61) < 2
    d = kf.gating_distance(mean, cov, np.array([[52.0, 62.0, 0.5, 40.0],
                                                [500.0, 500.0, 0.5, 40.0]]))
    assert d[0] < d[1]


def test_kalman_multi_predict_matches_single():
    kf = KalmanFilter()
    m1, c1 = kf.initiate(np.array([10.0, 20.0, 0.5, 40.0]))
    m2, c2 = kf.initiate(np.array([90.0, 80.0, 1.0, 30.0]))
    sm1, sc1 = kf.predict(m1, c1)
    sm2, sc2 = kf.predict(m2, c2)
    bm, bc = kf.multi_predict(np.stack([m1, m2]), np.stack([c1, c2]))
    np.testing.assert_allclose(bm[0], sm1, atol=1e-10)
    np.testing.assert_allclose(bc[1], sc2, atol=1e-10)


def test_tracker_follows_one_object():
    metric = NearestNeighborDistanceMetric("cosine", 0.5, budget=5)
    tracker = Tracker(metric, n_init=1)
    xs = [10, 14, 18, 22, 26]
    for x in xs:
        tracker.predict()
        tracker.update([make_det(x, 30)])
    assert len(tracker.tracks) == 1
    t = tracker.tracks[0]
    assert t.is_confirmed() and t.track_id == 1
    tlwh = t.to_tlwh()
    assert abs(tlwh[0] - 26) < 4


def test_tracker_two_objects_stable_ids():
    metric = NearestNeighborDistanceMetric("cosine", 0.5, budget=5)
    tracker = Tracker(metric, n_init=1)
    fa = np.zeros(8, np.float32); fa[0] = 1
    fb = np.zeros(8, np.float32); fb[1] = 1
    for step in range(6):
        tracker.predict()
        tracker.update([
            make_det(10 + 4 * step, 30, feat=fa),
            make_det(300 - 4 * step, 200, feat=fb),
        ])
    assert len(tracker.tracks) == 2
    ids = sorted(t.track_id for t in tracker.tracks)
    assert ids == [1, 2]
    # identity is consistent: track 1 should be near the "a" trajectory
    t1 = [t for t in tracker.tracks if t.track_id == 1][0]
    assert t1.to_tlwh()[0] < 100


def test_tracker_handles_miss_and_reacquire():
    metric = NearestNeighborDistanceMetric("cosine", 0.5, budget=5)
    tracker = Tracker(metric, n_init=1, max_age=10)
    f = np.ones(8, np.float32)
    # two hits -> confirmed
    tracker.predict(); tracker.update([make_det(10, 10, feat=f)])
    tracker.predict(); tracker.update([make_det(11, 10, feat=f)])
    assert tracker.tracks[0].is_confirmed()
    # miss, then reacquire via the appearance cascade: same id survives
    tracker.predict(); tracker.update([])
    tracker.predict(); tracker.update([make_det(13, 11, feat=f)])
    assert len(tracker.tracks) == 1
    assert tracker.tracks[0].track_id == 1
    assert tracker.tracks[0].time_since_update == 0


def test_tentative_track_dies_on_first_miss():
    """Reference parity: with n_init=1 a track confirms on its *second*
    update, so a single-frame object followed by a miss is deleted
    (deep_sort/track.py mark_missed)."""
    metric = NearestNeighborDistanceMetric("cosine", 0.5, budget=5)
    tracker = Tracker(metric, n_init=1, max_age=10)
    tracker.predict(); tracker.update([make_det(10, 10)])
    tracker.predict(); tracker.update([])
    assert len(tracker.tracks) == 0


def test_create_obj_infos_filters():
    boxes = np.array([[0, 0, 10, 20], [5, 5, 25, 45], [1, 1, 9, 9]], np.float32)
    labels = np.array([1, 1, 2])
    probs = np.array([0.9, 0.5, 0.99])
    feats = np.ones((3, 4), np.float32)
    valid = np.array([True, True, True])
    id2name = {1: "Person", 2: "Vehicle"}
    dets = create_obj_infos(boxes, labels, probs, feats, valid, id2name,
                            "Person", scale=1.0, min_confidence=0.85)
    assert len(dets) == 1
    np.testing.assert_allclose(dets[0].tlwh, [0, 0, 10, 20])
    # scale-back and coco mapping
    dets = create_obj_infos(boxes * 2, labels, probs, feats, valid,
                            {1: "car", 2: "person"}, "Vehicle", scale=2.0,
                            min_confidence=0.5,
                            coco_to_actev={"car": "Vehicle"})
    assert len(dets) == 2
    np.testing.assert_allclose(dets[0].tlwh, [0, 0, 10, 20])


def test_create_obj_infos_drops_degenerate_boxes():
    """Regression for the round-1 bench NaN path: zero-height / zero-width
    boxes must never reach Detection (to_xyah divides by h) or the Kalman
    filter (NaN matmul)."""
    boxes = np.array([
        [10, 10, 30, 10],     # zero height
        [10, 10, 10, 30],     # zero width
        [30, 30, 10, 50],     # negative width (x2 < x1)
        [10, 10, 30, 50],     # good
    ], np.float32)
    labels = np.array([1, 1, 1, 1])
    probs = np.array([0.99, 0.99, 0.99, 0.99])
    feats = np.ones((4, 4), np.float32)
    valid = np.ones(4, bool)
    dets = create_obj_infos(boxes, labels, probs, feats, valid,
                            {1: "Person"}, "Person", min_confidence=0.85)
    assert len(dets) == 1
    np.testing.assert_allclose(dets[0].tlwh, [10, 10, 20, 40])
    # and the surviving detection keeps the tracker NaN-free
    metric = NearestNeighborDistanceMetric("cosine", 0.5, budget=5)
    tracker = Tracker(metric, n_init=1)
    tracker.predict(); tracker.update(dets)
    tracker.predict(); tracker.update(dets)
    for t in tracker.tracks:
        assert np.isfinite(t.mean).all() and np.isfinite(t.covariance).all()


def test_linear_inter_and_filter_short():
    rows = np.array([
        [0, 1, 10, 10, 5, 5],
        [8, 1, 18, 18, 5, 5],
        [0, 2, 50, 50, 5, 5],   # one-frame track -> filtered
    ], np.float32)
    interp = linear_inter_bbox(rows, frame_gap=8)
    f4 = interp[(interp[:, 0] == 4) & (interp[:, 1] == 1)]
    assert len(f4) == 1
    np.testing.assert_allclose(f4[0, 2:4], [14, 14])
    filtered = filter_short_objs(interp, min_frames=2)
    assert not (filtered[:, 1] == 2).any()
    assert (filtered[:, 1] == 1).sum() == 9  # frames 0..8


def test_batched_gating_matches_per_track():
    """gating_distance_multi == per-track gating_distance (the batched
    path replaced the per-track loop in gate_cost_matrix)."""
    from object_detection_tracking_tpu.tracking.kalman import KalmanFilter
    kf = KalmanFilter()
    rng = np.random.RandomState(0)
    means, covs = [], []
    for _ in range(7):
        m, c = kf.initiate(np.array([rng.uniform(0, 100), rng.uniform(0, 100),
                                     rng.uniform(0.3, 3), rng.uniform(5, 80)]))
        for _ in range(rng.randint(0, 4)):
            m, c = kf.predict(m, c)
        means.append(m); covs.append(c)
    meas = np.column_stack([rng.uniform(0, 100, 9), rng.uniform(0, 100, 9),
                            rng.uniform(0.3, 3, 9), rng.uniform(5, 80, 9)])
    for only_pos in (False, True):
        batched = kf.gating_distance_multi(
            np.stack(means), np.stack(covs), meas, only_pos)
        for i, (m, c) in enumerate(zip(means, covs)):
            ref = kf.gating_distance(m, c, meas, only_pos)
            np.testing.assert_allclose(batched[i], ref, rtol=1e-5, atol=1e-7)


def test_nn_metric_segmented_min_matches_loop():
    from object_detection_tracking_tpu.tracking.deep_sort.nn_matching import (
        NearestNeighborDistanceMetric, _cosine_distance)
    rng = np.random.RandomState(1)
    metric = NearestNeighborDistanceMetric("cosine", 0.5, budget=5)
    targets = [3, 7, 11]
    metric.samples = {t: [rng.randn(16).astype(np.float32)
                          for _ in range(rng.randint(1, 6))] for t in targets}
    feats = rng.randn(4, 16).astype(np.float32)
    got = metric.distance(feats, targets)
    for i, t in enumerate(targets):
        ref = _cosine_distance(np.asarray(metric.samples[t]), feats).min(0)
        np.testing.assert_allclose(got[i], ref, rtol=1e-5, atol=1e-6)


def test_link_tracklets_merges_split_identity():
    from object_detection_tracking_tpu.tracking.deep_sort import (
        link_tracklets)
    # id 1 spans frames 0-9, id 5 spans 13-20 nearby with the same
    # appearance -> one identity; id 9 overlaps id 1 in time -> untouched
    rows = []
    for f in range(10):
        rows.append([f, 1, 10 + 2 * f, 30, 20, 40])
    for f in range(13, 21):
        rows.append([f, 5, 10 + 2 * f, 30, 20, 40])
    for f in range(0, 21):
        rows.append([f, 9, 100, 100, 20, 40])
    data = np.asarray(rows, np.float32)
    fa = np.zeros(8, np.float32); fa[0] = 1
    fb = np.zeros(8, np.float32); fb[1] = 1
    out = link_tracklets(data, {1: fa, 5: fa * 3.0, 9: fb},
                         max_gap=10, max_feat_dist=0.2)
    ids = set(out[:, 1].astype(int))
    assert ids == {1, 9}
    merged = out[out[:, 1] == 1]
    assert merged[:, 0].min() == 0 and merged[:, 0].max() == 20


def test_link_tracklets_respects_gates():
    from object_detection_tracking_tpu.tracking.deep_sort import (
        link_tracklets)
    rows = ([[f, 1, 10, 30, 20, 40] for f in range(5)]
            + [[f, 2, 12, 30, 20, 40] for f in range(8, 12)])
    data = np.asarray(rows, np.float32)
    fa = np.zeros(8, np.float32); fa[0] = 1
    fb = np.zeros(8, np.float32); fb[1] = 1
    # different appearance -> no link
    out = link_tracklets(data, {1: fa, 2: fb}, max_feat_dist=0.3)
    assert set(out[:, 1].astype(int)) == {1, 2}
    # same appearance but teleport (gap 3, 500 px) -> motion gate blocks
    far = data.copy(); far[far[:, 1] == 2, 2] += 500
    out = link_tracklets(far, {1: fa, 2: fa}, max_feat_dist=0.3,
                         max_speed=1.0)
    assert set(out[:, 1].astype(int)) == {1, 2}
    # gap beyond max_gap -> no link
    out = link_tracklets(data, {1: fa, 2: fa}, max_gap=2,
                         max_feat_dist=0.3)
    assert set(out[:, 1].astype(int)) == {1, 2}
    # missing feature -> no link
    out = link_tracklets(data, {1: fa}, max_feat_dist=0.3)
    assert set(out[:, 1].astype(int)) == {1, 2}


def test_link_tracklets_chains_compose():
    from object_detection_tracking_tpu.tracking.deep_sort import (
        link_tracklets)
    rows = ([[f, 1, 10 + f, 30, 20, 40] for f in range(4)]
            + [[f, 2, 10 + f, 30, 20, 40] for f in range(6, 10)]
            + [[f, 3, 10 + f, 30, 20, 40] for f in range(12, 16)])
    data = np.asarray(rows, np.float32)
    fa = np.zeros(8, np.float32); fa[0] = 1
    out = link_tracklets(data, {1: fa, 2: fa, 3: fa}, max_feat_dist=0.2)
    assert set(out[:, 1].astype(int)) == {1}


def test_link_tracklets_scales_with_frame_gap():
    """ADVICE r4: rows emitted every frame_gap frames must not be split
    into per-row segments (seg_split/max_gap are in detection steps)."""
    from object_detection_tracking_tpu.tracking.deep_sort import (
        link_tracklets)
    f = np.zeros(8, np.float32); f[0] = 1
    rows = ([[t, 1, 10 + t, 10, 20, 40] for t in range(0, 80, 8)]
            + [[t, 2, 10 + t, 10, 20, 40] for t in range(120, 168, 8)])
    data = np.asarray(rows, np.float32)
    # gap is 48 frames = 6 detection steps: linkable at frame_gap=8
    out = link_tracklets(data, {1: f, 2: f}, frame_gap=8, max_speed=5.0)
    assert set(out[:, 1].astype(int)) == {1}
    # ... but NOT at frame_gap=1 (48 > max_gap 40)
    out = link_tracklets(data, {1: f, 2: f}, frame_gap=1, max_speed=5.0)
    assert set(out[:, 1].astype(int)) == {1, 2}


def test_feature_archive_means_whole_life():
    metric = NearestNeighborDistanceMetric("cosine", 0.5, budget=2)
    tracker = Tracker(metric, n_init=1)
    f0 = np.zeros(4, np.float32); f0[0] = 1
    f1 = np.zeros(4, np.float32); f1[1] = 1
    tracker.predict()
    tracker.update([Detection([10, 30, 20, 40], 0.9, f0)])
    tracker.predict()
    tracker.update([Detection([12, 30, 20, 40], 0.9, f1)])
    arch = tracker.feature_archive()
    # frame 1 initiates with f0, frame 2's update folds in f1 -> mean
    np.testing.assert_allclose(arch[1], np.array([1, 1, 0, 0]) / 2.0,
                               atol=1e-6)
