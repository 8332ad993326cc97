import numpy as np
import jax.numpy as jnp

from object_detection_tracking_tpu.ops import nms as N
from tests.test_boxes import rand_boxes


def run_both(boxes, scores, max_out, thres, score_thres=None):
    idx, valid = N.nms(jnp.asarray(boxes), jnp.asarray(scores), max_out,
                       thres, score_thres=score_thres)
    got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v]
    want = N.nms_np(boxes, scores, max_out, thres, score_thres=score_thres)
    return got, want


def test_nms_matches_reference_random():
    for seed in range(5):
        rng = np.random.RandomState(seed)
        boxes = rand_boxes(64, seed=seed)
        scores = rng.uniform(0, 1, 64).astype(np.float32)
        got, want = run_both(boxes, scores, 20, 0.5)
        assert got == want, (seed, got, want)


def test_nms_chain_suppression():
    # overlapping chain: 0 suppresses 1, 1 would suppress 2 but 1 is gone,
    # 0 does not overlap 2 enough -> keep {0, 2}
    boxes = np.array([
        [0, 0, 10, 10],
        [4, 0, 14, 10],
        [8, 0, 18, 10],
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    got, want = run_both(boxes, scores, 3, 0.3)
    assert want == [0, 2]
    assert got == want


def test_nms_max_out_cap():
    boxes = rand_boxes(32, seed=9)
    # disjoint boxes: shift them apart so nothing suppresses
    boxes[:, [0, 2]] += np.arange(32)[:, None] * 200
    scores = np.linspace(1, 0.1, 32).astype(np.float32)
    got, want = run_both(boxes, scores, 5, 0.5)
    assert len(got) == 5 and got == want == [0, 1, 2, 3, 4]


def test_nms_score_thres():
    boxes = rand_boxes(16, seed=11)
    boxes[:, [0, 2]] += np.arange(16)[:, None] * 300
    scores = np.linspace(1, 0.0, 16).astype(np.float32)
    got, want = run_both(boxes, scores, 16, 0.5, score_thres=0.5)
    assert got == want
    assert all(scores[i] > 0.5 for i in got)


def test_nms_order_is_score_descending():
    boxes = rand_boxes(40, seed=13)
    rng = np.random.RandomState(13)
    scores = rng.uniform(0, 1, 40).astype(np.float32)
    got, _ = run_both(boxes, scores, 40, 0.4)
    s = scores[got]
    assert np.all(np.diff(s) <= 0)


def test_batched_nms():
    rng = np.random.RandomState(7)
    boxes = np.stack([rand_boxes(32, seed=s) for s in range(4)])
    scores = rng.uniform(0, 1, (4, 32)).astype(np.float32)
    idx, valid = N.batched_nms(jnp.asarray(boxes), jnp.asarray(scores), 10, 0.5)
    assert idx.shape == (4, 10)
    for b in range(4):
        got = [int(i) for i, v in zip(np.asarray(idx[b]), np.asarray(valid[b])) if v]
        want = N.nms_np(boxes[b], scores[b], 10, 0.5)
        assert got == want
