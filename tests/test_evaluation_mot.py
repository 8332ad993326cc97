"""CLEAR-MOT / IDF1 metric behavior on hand-built scenarios."""

import numpy as np

from object_detection_tracking_tpu.evaluation_mot import (clear_mot,
                                                          evaluate_tracks,
                                                          idf1,
                                                          load_mot_txt)


def _box(x, y, s=10):
    return (x, y, x + s, y + s)


def test_perfect_tracking():
    gt = {t: [(1, _box(5 * t, 0)), (2, _box(0, 50))] for t in range(10)}
    hyp = {t: [(7, _box(5 * t, 0)), (9, _box(0, 50))] for t in range(10)}
    m = evaluate_tracks(gt, hyp)
    assert m["mota"] == 1.0 and m["idsw"] == 0
    assert m["idf1"] == 1.0 and m["fn"] == 0 and m["fp"] == 0
    assert m["motp"] > 0.99


def test_id_switch_counted_once_and_halves_idf1():
    gt = {t: [(1, _box(3 * t, 0))] for t in range(10)}
    hyp = {t: [(100 if t < 5 else 200, _box(3 * t, 0))] for t in range(10)}
    m = evaluate_tracks(gt, hyp)
    assert m["idsw"] == 1
    assert m["mota"] == 1.0 - 1 / 10
    assert abs(m["idf1"] - 0.5) < 1e-9  # best id covers 5 of 10 frames


def test_false_positives_and_misses():
    gt = {t: [(1, _box(0, 0))] for t in range(4)}
    hyp = {0: [(5, _box(0, 0))], 1: [],                     # 1 FN
           2: [(5, _box(0, 0)), (6, _box(80, 80))],        # 1 FP
           3: [(5, _box(0, 0))]}
    m = evaluate_tracks(gt, hyp)
    assert m["fn"] == 1 and m["fp"] == 1 and m["idsw"] == 0
    assert abs(m["mota"] - (1.0 - 2 / 4)) < 1e-9


def test_match_continuity_preferred_over_greedy_iou():
    """An existing pair is kept even when a new hypothesis overlaps
    slightly better (CLEAR continuity rule)."""
    gt = {0: [(1, _box(0, 0))], 1: [(1, _box(0, 0))]}
    hyp = {0: [(5, _box(1, 1))],
           1: [(5, _box(1, 1)), (6, _box(0, 0))]}  # 6 has better IOU
    m = clear_mot(gt, hyp)
    assert m["idsw"] == 0
    assert m["fp"] == 1  # the better-overlapping newcomer is unmatched


def test_fragmentation_lowers_idf1_correctly():
    # gt covered by 3 hyp fragments of 6, 3, 1 frames -> IDTP = 6
    frags = [(0, 6, "a"), (6, 9, "b"), (9, 10, "c")]
    gt = {t: [(1, _box(2 * t, 0))] for t in range(10)}
    hyp = {}
    for s, e, hid in frags:
        for t in range(s, e):
            hyp[t] = [(hid, _box(2 * t, 0))]
    m = idf1(gt, hyp)
    assert m["idtp"] == 6
    assert abs(m["idf1"] - 2 * 6 / (2 * 6 + 4 + 4)) < 1e-9


def test_load_mot_txt(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("1,3,10,20,30,40,1,-1,-1,-1\n2,3,11,21,30,40,1,-1,-1,-1\n")
    ft = load_mot_txt(str(p))
    assert ft[1] == [(3, (10.0, 20.0, 40.0, 60.0))]
    assert ft[2][0][1] == (11.0, 21.0, 41.0, 61.0)


def test_class_aware_usage_pattern():
    """Per-class dicts compose: overall metrics from disjoint id spaces."""
    rng = np.random.RandomState(0)
    gt, hyp = {}, {}
    for t in range(5):
        gt[t] = [("p1", _box(t, 0)), ("v1", _box(0, 60))]
        hyp[t] = [("h1", _box(t, 0)), ("h2", _box(0, 60))]
    m = evaluate_tracks(gt, hyp)
    assert m["idf1"] == 1.0 and m["mota"] == 1.0


def test_eval_mot_cli_dir_mode(tmp_path):
    """eval_mot CLI scores the tracking-dir layout per video/class."""
    from object_detection_tracking_tpu.cli import eval_mot
    for root in ("gt", "hyp"):
        d = tmp_path / root / "vidA" / "Person"
        d.mkdir(parents=True)
        rows = [f"{t},1,{5*t},0,10,10,1,-1,-1,-1" for t in range(1, 6)]
        (d / "vidA.txt").write_text("\n".join(rows))
    (tmp_path / "videos.lst").write_text("vidA.mp4\n")
    out = eval_mot.main([str(tmp_path / "gt"), str(tmp_path / "hyp"),
                         "--videonamelst", str(tmp_path / "videos.lst"),
                         "--classes", "Person"])
    assert out["mota"] == 1.0 and out["fn"] == 0 and out["fp"] == 0
