"""Host-side per-stage timeline of the END-TO-END bench pipeline.

VERDICT r3 weak #2: end-to-end regressed ~30% r02->r03 while the
device side got faster — so the loss is on the host/tunnel path, which
tools/profile_pipeline.py (device stages only) cannot see. This tool
times each host stage of bench.py's run_video loop in ISOLATION on the
same video/config, then runs the real overlapped pipeline, so the wall
clock can be attributed:

  decode      cv2 grab/retrieve + resize + I420 convert (VideoEnqueuer)
  delta       uint8 wraparound diff encode (DetectionRunner.fill)
  h2d         device_put of the delta batches, synced (tunnel upload)
  compute     staged forward per batch (input already in HBM)
  readback    np.asarray of the packed output (tunnel download)
  unpack      packed uint16 -> host dict
  track       create_obj_infos + DeepSORT predict/update on real outputs
  PIPELINE    the real overlapped runner.run loop (= bench.py headline)

Usage: timeout 900 python tools/profile_host.py [--seconds 16] [--reps 3]
Prints one JSON line with per-stage seconds and the derived x_realtime.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=16,
                    help="bench video length (48 = the full bench)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--trained", action="store_true",
                    help="use the cached trained checkpoint if present")
    args = ap.parse_args()

    import jax
    from bench import make_video, ensure_trained_params
    from object_detection_tracking_tpu.config import DetectorConfig
    from object_detection_tracking_tpu.data import VideoEnqueuer, open_video
    from object_detection_tracking_tpu.models import get_model
    from object_detection_tracking_tpu.runtime import (
        DetectionRunner, enable_persistent_cache)
    from object_detection_tracking_tpu.tracking.deep_sort import (
        Tracker, create_obj_infos)
    from object_detection_tracking_tpu.tracking.deep_sort.nn_matching import (
        NearestNeighborDistanceMetric)
    from object_detection_tracking_tpu.class_ids import coco_obj_to_actev_obj

    enable_persistent_cache()
    FPS, FRAME_GAP, BATCH = 30, 8, 8
    tmp = "/tmp/odt_bench"
    os.makedirs(tmp, exist_ok=True)
    path = os.path.join(tmp, f"prof_{args.seconds}s.mp4")
    if not os.path.exists(path):
        make_video(path, args.seconds * FPS, fps=FPS)

    cfg = DetectorConfig.coco_partial(
        resnet_depth=50, short_edge_size=720, max_size=1280)
    model = get_model(cfg, "faster_rcnn")
    params = model.init_params(jax.random.PRNGKey(0))
    if args.trained:
        params, _ = ensure_trained_params(tmp, params)
    runner = DetectionRunner(model, params, depth=args.depth)
    classid2name = cfg.classid2name
    coco_map = dict(coco_obj_to_actev_obj)

    def batches():
        enq = VideoEnqueuer(open_video(path), 720, 1280,
                            frame_gap=FRAME_GAP, batch_size=BATCH,
                            prefetch=3, pad_last_batch=True,
                            pixel_format="i420")
        return enq.get()

    def med(xs):
        return sorted(xs)[len(xs) // 2]

    stages = {}

    # --- decode (enqueuer thread does resize+I420 too); drain fully
    ts = []
    for _ in range(args.reps):
        t0 = time.time()
        n_batches = 0
        cache = []
        for imgs, sc, fi in batches():
            n_batches += 1
            cache.append((imgs, sc, fi))
        ts.append(time.time() - t0)
    stages["decode"] = med(ts)

    # --- delta encode on the cached raw batches
    ts = []
    for _ in range(args.reps):
        t0 = time.time()
        deltas = [DetectionRunner.encode_delta(imgs) for imgs, _, _ in cache]
        ts.append(time.time() - t0)
    stages["delta"] = med(ts)

    # --- h2d upload of the delta stream (synced per batch)
    ts = []
    for _ in range(args.reps):
        t0 = time.time()
        devs = [jax.device_put(d) for d in deltas]
        for d in devs:
            d.block_until_ready()
        # force one real sync through the tunnel (CLAUDE.md)
        float(np.asarray(devs[-1][0, 0, :4].astype(np.float32).sum()))
        ts.append(time.time() - t0)
    stages["h2d"] = med(ts)

    # --- compute, staged input already on device
    outs = [runner._fn(runner.params, d) for d in devs]  # compile+warm
    packed_host = [np.asarray(o) for o in outs]
    ts = []
    for _ in range(args.reps):
        t0 = time.time()
        for d in devs:
            o = runner._fn(runner.params, d)
        float(np.asarray(o.reshape(-1)[:4].astype(np.float32).sum()))
        ts.append(time.time() - t0)
    stages["compute"] = med(ts)

    # --- readback of the packed outputs
    ts = []
    for _ in range(args.reps):
        outs = [runner._fn(runner.params, d) for d in devs]
        for o in outs:
            o.block_until_ready()
        t0 = time.time()
        packed_host = [np.asarray(o) for o in outs]
        ts.append(time.time() - t0)
    stages["readback"] = med(ts)
    stages["readback_mb"] = sum(p.nbytes for p in packed_host) / 1e6

    # --- unpack
    ts = []
    for _ in range(args.reps):
        t0 = time.time()
        hosts = [runner._unpack(p) for p in packed_host]
        ts.append(time.time() - t0)
    stages["unpack"] = med(ts)

    # --- tracking on the real outputs
    ts = []
    for _ in range(args.reps):
        trackers = {
            obj: Tracker(NearestNeighborDistanceMetric("cosine", 0.5, 5))
            for obj in ("Person", "Vehicle")}
        t0 = time.time()
        n_dets = 0
        for host, (imgs, scale, fidx) in zip(hosts, cache):
            for bi, f in enumerate(fidx):
                if f < 0:
                    continue
                for obj, tr in trackers.items():
                    dets = create_obj_infos(
                        host["final_boxes"][bi], host["final_labels"][bi],
                        host["final_probs"][bi],
                        host["pooled_box_feat"][bi],
                        host["final_valid"][bi], classid2name, obj,
                        scale=scale, min_confidence=0.85,
                        coco_to_actev=coco_map)
                    n_dets += len(dets)
                    tr.predict()
                    tr.update(dets)
        ts.append(time.time() - t0)
    stages["track"] = med(ts)
    stages["dets_total"] = n_dets

    # --- the real overlapped pipeline (bench.py's measured loop)
    ts = []
    for _ in range(args.reps):
        trackers = {
            obj: Tracker(NearestNeighborDistanceMetric("cosine", 0.5, 5))
            for obj in ("Person", "Vehicle")}
        t0 = time.time()
        n = 0
        for host, (scale, fidx) in runner.run(
                (imgs, (sc, fi)) for imgs, sc, fi in batches()):
            for bi, f in enumerate(fidx):
                if f < 0:
                    continue
                n += 1
                for obj, tr in trackers.items():
                    dets = create_obj_infos(
                        host["final_boxes"][bi], host["final_labels"][bi],
                        host["final_probs"][bi],
                        host["pooled_box_feat"][bi],
                        host["final_valid"][bi], classid2name, obj,
                        scale=scale, min_confidence=0.85,
                        coco_to_actev=coco_map)
                    tr.predict()
                    tr.update(dets)
        ts.append(time.time() - t0)
    stages["PIPELINE"] = med(ts)
    stages["pipeline_all"] = [round(t, 2) for t in ts]

    n_frames = sum(1 for _, _, fi in cache for f in fi if f >= 0)
    stages = {k: (round(v, 3) if isinstance(v, float) else v)
              for k, v in stages.items()}
    stages["n_frames"] = n_frames
    stages["n_batches"] = len(cache)
    stages["x_realtime"] = round(
        n_frames * FRAME_GAP / FPS / stages["PIPELINE"], 2)
    stages["host_cpu_sum"] = round(
        sum(stages[k] for k in
            ("decode", "delta", "unpack", "track")), 3)
    print(json.dumps(stages))


if __name__ == "__main__":
    main()
