import numpy as np

from object_detection_tracking_tpu.tracking.tmot import JDETracker
from object_detection_tracking_tpu.tracking.tmot import matching as M


def det(x, y, w=20, h=40, conf=0.95, feat=None):
    if feat is None:
        feat = np.ones(8)
    return (np.array([x, y, w, h], float), conf, np.asarray(feat, float))


def test_ious_plus1_convention():
    a = np.array([[0, 0, 9, 9]], float)   # 10x10 box in +1 convention
    got = M.ious_plus1(a, a)
    np.testing.assert_allclose(got, [[1.0]])
    b = np.array([[5, 0, 14, 9]], float)
    # inter 5x10=50, union 100+100-50
    np.testing.assert_allclose(M.ious_plus1(a, b), [[50 / 150]])


def test_linear_assignment_thresh():
    cost = np.array([[0.1, 0.9], [0.9, 0.2]])
    m, ua, ub = M.linear_assignment(cost, thresh=0.5)
    assert m.tolist() == [[0, 0], [1, 1]]
    m, ua, ub = M.linear_assignment(cost, thresh=0.15)
    assert m.tolist() == [[0, 0]]
    assert list(ua) == [1] and list(ub) == [1]


def test_jde_tracks_two_objects():
    tr = JDETracker(conf_thres=0.5)
    fa = np.zeros(8); fa[0] = 1
    fb = np.zeros(8); fb[1] = 1
    out_hist = []
    for step in range(8):
        dets = [det(10 + 5 * step, 30, feat=fa),
                det(300 - 5 * step, 200, feat=fb)]
        out = tr.update(dets)
        out_hist.append({t.track_id for t in out})
    # frame 1: new tracks not yet activated -> empty output
    assert out_hist[0] == set()
    assert out_hist[-1] == {1, 2}


def test_jde_reactivates_lost_track_via_embedding():
    tr = JDETracker(conf_thres=0.5, track_max_second_lost=8)
    f = np.ones(8)
    for step in range(3):
        tr.update([det(10 + 5 * step, 30, feat=f)])
    assert len(tr.tracked_stracks) == 1
    tid = tr.tracked_stracks[0].track_id
    # miss 2 frames -> lost
    tr.update([]); tr.update([])
    assert len(tr.lost_stracks) == 1
    # reappears nearby with the same appearance -> same id
    out = tr.update([det(35, 31, feat=f)])
    assert {t.track_id for t in out} == {tid}


def test_jde_outputs_detection_boxes():
    tr = JDETracker(conf_thres=0.5)
    f = np.ones(8)
    for step in range(3):
        out = tr.update([det(10 + 5 * step, 30, feat=f)])
    t = out[0]
    np.testing.assert_allclose(t.cur_det_tlwh, [20, 30, 20, 40])


def test_jde_reset():
    tr = JDETracker(conf_thres=0.5)
    for step in range(3):
        tr.update([det(10 + 5 * step, 30)])
    tr.reset()
    assert tr.frame_id == 0 and not tr.tracked_stracks
    for step in range(2):
        tr.update([det(10, 30)])
    assert tr.tracked_stracks[0].track_id == 1  # id counter reset


def test_feature_archive_covers_all_assigned_ids():
    from object_detection_tracking_tpu.tracking.tmot import JDETracker
    import numpy as np
    tr = JDETracker(conf_thres=0.5, frame_gap=1)
    fa = np.zeros(8); fa[0] = 1
    fb = np.zeros(8); fb[1] = 1
    # two objects for several frames, then one disappears long enough
    # to be removed — its id must still be in the archive
    for f in range(4):
        tr.update([((10 + 2 * f, 10, 5, 10), 0.9, fa),
                   ((50, 50, 5, 10), 0.9, fb)])
    for f in range(140):
        tr.update([((18 + 2 * f, 10, 5, 10), 0.9, fa)])
    arch = tr.feature_archive()
    assert set(arch.keys()) == {1, 2}
    # archived means are whole-life normalized-feature means
    np.testing.assert_allclose(arch[2], fb / np.linalg.norm(fb), atol=1e-9)
