"""End-to-end determinism: the same frames must produce identical
detections and identical tracks across two runs (the reference verified
this manually across run types, SPEED.md:5; here it's automated)."""

import numpy as np
import jax
import pytest

from object_detection_tracking_tpu.config import DetectorConfig
from object_detection_tracking_tpu.models import get_model
from object_detection_tracking_tpu.tracking.deep_sort import (
    Tracker, create_obj_infos)
from object_detection_tracking_tpu.tracking.deep_sort.nn_matching import (
    NearestNeighborDistanceMetric)


def run_pipeline(model, params, frames, classid2name):
    fn = jax.jit(model.forward)
    metric = NearestNeighborDistanceMetric("cosine", 0.5, 5)
    tracker = Tracker(metric)
    rows = []
    for fi, frame in enumerate(frames):
        out = fn(params, frame[None])
        dets = create_obj_infos(
            np.asarray(out["final_boxes"][0]),
            np.asarray(out["final_labels"][0]),
            np.asarray(out["final_probs"][0]),
            np.asarray(out["pooled_box_feat"][0]),
            np.asarray(out["final_valid"][0]),
            classid2name, "Person", min_confidence=0.0)
        tracker.predict()
        tracker.update(dets)
        for t in tracker.tracks:
            if t.is_confirmed() and t.time_since_update == 0:
                b = t.to_tlwh()
                rows.append((fi, t.track_id, round(float(b[0]), 4),
                             round(float(b[1]), 4)))
    return rows


def test_detect_track_deterministic():
    cfg = DetectorConfig(
        num_class=4, resnet_depth=18, short_edge_size=48, max_size=64,
        rpn_test_post_nms_topk=32, result_per_im=8, compute_dtype="float32")
    model = get_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (48, 64, 3)).astype(np.uint8)
              for _ in range(4)]
    id2name = {i: "Person" for i in range(1, 4)}
    rows1 = run_pipeline(model, params, frames, id2name)
    rows2 = run_pipeline(model, params, frames, id2name)
    assert rows1 == rows2
    assert len(rows1) > 0
