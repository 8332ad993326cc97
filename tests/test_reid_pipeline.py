import numpy as np

from object_detection_tracking_tpu.reid import (
    compute_c1_to_c2_homography, compute_feature_dist, compute_spatial_dist,
    find_candidate_pairs, link_across_cameras, merge_candidates, warp_points)
from object_detection_tracking_tpu.reid.multi_video import (GlobalTracks,
                                                            add_foot_points)
from object_detection_tracking_tpu.reid.single_video import (
    collect_box_requests, compute_candidate_distances, crop_track_boxes,
    relink_video_tracks)


def rows(track_id, frames, x0, y0=100, step=4, conf=0.95, w=20, h=40):
    return np.array([[f, track_id, x0 + i * step, y0, w, h, conf]
                     for i, f in enumerate(frames)], np.float32)


def test_candidate_pairs_time_and_space_gates():
    tracks = {
        1: rows(1, range(0, 40, 8), 100),           # ends frame 32 at x~116
        2: rows(2, range(40, 80, 8), 120),          # starts right after, near
        3: rows(3, range(200, 240, 8), 120),        # too late
        4: rows(4, range(40, 80, 8), 600),          # far away
    }
    pairs = find_candidate_pairs(tracks, tol_num_frame=30)
    assert list(pairs) == [1]
    assert pairs[1][0][0] == 2


class FakeExtractor:
    """Features = mean crop color; same-colored crops match."""

    def __call__(self, crops):
        return np.stack([np.full(4, float(c.mean())) for c in crops])


def test_relink_merges_same_appearance(tmp_path):
    t1 = rows(1, range(0, 40, 8), 100)
    t2 = rows(2, range(48, 88, 8), 124)   # same object, new id
    t3 = rows(3, range(48, 88, 8), 124)   # different appearance competitor
    t3[:, 3] += 10
    data = np.concatenate([t1, t2, t3])
    track_file = tmp_path / "t.txt"
    with open(track_file, "w") as f:
        for r in data.tolist():
            f.write("%d,%d,%.1f,%.1f,%.1f,%.1f,%.2f,-1,-1,-1\n" % tuple(r))

    # synthetic frames: object 1+2 drawn bright, object 3 dark
    def frame_iter():
        for idx in range(90):
            im = np.zeros((200, 400, 3), np.uint8)
            im[100:140, :, :] = 200         # bright band covers t1/t2 boxes
            im[110:150, :, :2] = 10         # darker band for t3's offset box
            yield im, idx

    new_tracks = relink_video_tracks(
        str(track_file), frame_iter(), FakeExtractor(),
        tol_num_frame=30, reject_dist_thres=50.0)
    # ids 1 and 2 merged into 1; 3 stays (or merged only if appearance close)
    assert 1 in new_tracks
    assert 2 not in new_tracks
    merged_frames = sorted(new_tracks[1][:, 0].tolist())
    assert merged_frames[0] == 0 and merged_frames[-1] == 80


def test_homography_identity_roundtrip():
    k = np.array([[1000, 0, 640], [0, 1000, 360], [0, 0, 1.0]])
    r1 = np.eye(3)
    t1 = np.array([[0.0], [0.0], [5.0]])
    h_self = compute_c1_to_c2_homography(r1, t1, k, r1, t1, k)
    np.testing.assert_allclose(h_self, np.eye(3), atol=1e-9)
    pts = np.array([[100.0, 640.0], [200.0, 360.0]])
    np.testing.assert_allclose(warp_points(pts, h_self), pts, atol=1e-6)


def test_spatial_and_feature_dist_gating():
    r1 = add_foot_points(rows(1, range(0, 40, 8), 100))
    r2_near = add_foot_points(rows(7, range(0, 40, 8), 102))
    r2_far = add_foot_points(rows(8, range(0, 40, 8), 500))
    f_a = np.ones((3, 4)); f_b = np.ones((2, 4)) * 1.01; f_c = np.zeros((2, 4))
    tracks1 = {1: (r1, f_a)}
    tracks2 = {7: (r2_near, f_b), 8: (r2_far, f_c)}
    sd = compute_spatial_dist(tracks1, tracks2, tol=50)
    assert sd[0, 0] < 50 and sd[0, 1] >= 9999
    fd = compute_feature_dist(tracks1, tracks2, sd)
    assert fd[0, 0] < 0.01 and fd[0, 1] == 999.0


def test_link_across_cameras_global_ids():
    r_a = add_foot_points(rows(1, range(0, 40, 8), 100))
    r_b = add_foot_points(rows(5, range(0, 40, 8), 101))
    feats = np.ones((3, 4))
    all_tracks = {
        "cam1": {"Person": {1: (r_a, feats)}},
        "cam2": {"Person": {5: (r_b, feats * 1.001)}},
    }
    gt = link_across_cameras(all_tracks, {"cam1": 0, "cam2": 0})
    l2g_1 = gt.local_to_global("Person", "cam1")
    l2g_2 = gt.local_to_global("Person", "cam2")
    assert l2g_1.get(1) == l2g_2.get(5) == 1
