import numpy as np

from object_detection_tracking_tpu import evaluation as E


def test_match_detection_greedy_by_score_order():
    # two dets (already score-sorted), one gt; first det grabs the gt
    d = [[0, 0, 10, 10], [1, 1, 10, 10]]
    g = [[0, 0, 10, 10]]
    dm, gtm = E.match_detection(d, g, E.iou_xywh(d, g))
    assert dm[0] == 0 and dm[1] == -1 and gtm[0] == 0


def test_perfect_detection_ap1():
    eval_target = {"Person": 1}
    e = {"Person": {}}
    dt = {"Person": [([0, 0, 10, 10], 0.9), ([50, 50, 10, 10], 0.8)]}
    gt = {"Person": [[0, 0, 10, 10], [50, 50, 10, 10]]}
    E.match_dt_gt(e, "img0", dt, gt, eval_target)
    aps, ars = E.aggregate_eval(e)
    assert aps["Person"] == 1.0 and ars["Person"] == 1.0


def test_false_positive_lowers_ap():
    eval_target = {"Person": 1}
    e = {"Person": {}}
    # high-scoring FP ranks first
    dt = {"Person": [([200, 200, 10, 10], 0.95), ([0, 0, 10, 10], 0.9)]}
    gt = {"Person": [[0, 0, 10, 10]]}
    E.match_dt_gt(e, "img0", dt, gt, eval_target)
    aps, ars = E.aggregate_eval(e)
    assert aps["Person"] == 0.5  # TP at rank 2 -> 1/2, /1 gt
    assert ars["Person"] == 1.0


def test_missed_gt_lowers_ap_v2():
    eval_target = {"Person": 1}
    e = {"Person": {}}
    dt = {"Person": [([0, 0, 10, 10], 0.9)]}
    gt = {"Person": [[0, 0, 10, 10], [100, 100, 10, 10]]}
    E.match_dt_gt(e, "img0", dt, gt, eval_target)
    aps, ars = E.aggregate_eval(e)
    assert aps["Person"] == 0.5  # 1 matched of 2 gt
    assert ars["Person"] == 0.5


def test_multi_image_score_sorted_accumulation():
    eval_target = {"Car": 1}
    e = {"Car": {}}
    E.match_dt_gt(e, "a", {"Car": [([0, 0, 10, 10], 0.9)]},
                  {"Car": [[0, 0, 10, 10]]}, eval_target)
    E.match_dt_gt(e, "b", {"Car": [([5, 5, 10, 10], 0.95)]},
                  {"Car": [[100, 100, 5, 5]]}, eval_target)  # FP + missed gt
    aps, ars = E.aggregate_eval(e)
    # global ranking: FP(0.95), TP(0.9) -> precision at rank2 = 1/2; 2 gts
    assert abs(aps["Car"] - 0.25) < 1e-9
    assert ars["Car"] == 0.5
    ap_avg, ar_avg = E.weighted_average(aps, ars)
    assert ap_avg == aps["Car"]


def test_coco_style_perfect_detection():
    dt = {"Person": [([0, 0, 10, 10], 0.9), ([50, 50, 10, 10], 0.8)]}
    gt = {"Person": [[0, 0, 10, 10], [50, 50, 10, 10]]}
    aps, mAP, mAP50 = E.evaluate_coco_style(
        [(dt, gt)], {"Person": 1})
    assert mAP == 1.0 and mAP50 == 1.0


def test_coco_style_loose_box_drops_at_high_iou():
    # det overlaps gt with IOU ~0.6: counts at t=0.5/0.55/0.6 only
    dt = {"Car": [([0, 0, 10, 12], 0.9)]}   # vs gt 10x8 -> IOU 2/3
    gt = {"Car": [[0, 0, 10, 8]]}
    aps, mAP, mAP50 = E.evaluate_coco_style([(dt, gt)], {"Car": 1})
    assert mAP50 == 1.0
    # IOU = 80/120 = 0.667 -> passes t = .5, .55, .6, .65 -> 4/10 thresholds
    assert abs(mAP - 0.4) < 1e-6


def test_coco_style_fp_penalty():
    dt = {"Car": [([100, 100, 5, 5], 0.95), ([0, 0, 10, 10], 0.9)]}
    gt = {"Car": [[0, 0, 10, 10]]}
    aps, mAP, mAP50 = E.evaluate_coco_style([(dt, gt)], {"Car": 1})
    # TP at rank 2: 101-pt AP = precision 0.5 over all recall points
    assert abs(mAP50 - 0.5) < 1e-6
