"""Driver benchmark: det+track throughput at 1280x720, frame_gap 8.

Measures the full pipeline on the real TPU chip — host decode -> resize ->
pipelined H2D -> jit Faster-RCNN-R50-FPN (COCO partial classes) -> pooled
embeddings D2H -> Deep SORT (Person+Vehicle) -> MOT rows — on a synthetic
720p video, and reports coverage relative to real time:

    x_realtime = (processed_frames * frame_gap / video_fps) / wall_seconds

vs_baseline is against the BASELINE.json north star of 8x real time per
chip. Prints ONE json line.
"""

import json
import os
import sys
import time

import numpy as np


def make_video(path, n_frames, w=1280, h=720, fps=30):
    import cv2
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    base = np.tile(np.linspace(40, 90, w, dtype=np.uint8), (h, 1))
    base = np.stack([base] * 3, axis=-1)
    rng = np.random.RandomState(0)
    objs = [(rng.randint(0, w - 80), rng.randint(0, h - 160),
             rng.randint(2, 6), rng.randint(-2, 3)) for _ in range(12)]
    for i in range(n_frames):
        frame = base.copy()
        for k, (x0, y0, vx, vy) in enumerate(objs):
            x = int(x0 + vx * i) % (w - 80)
            y = int(y0 + vy * i) % (h - 160)
            color = (int(50 + 40 * k) % 255, 80, (200 - 15 * k) % 255)
            cv2.rectangle(frame, (x, y), (x + 60, y + 140), color, -1)
        vw.write(frame)
    vw.release()
    return path


def main():
    t_setup = time.time()
    import jax
    from object_detection_tracking_tpu.config import DetectorConfig
    from object_detection_tracking_tpu.data import VideoEnqueuer, open_video
    from object_detection_tracking_tpu.models import get_model
    from object_detection_tracking_tpu.runtime import (DetectionRunner,
                                                       enable_persistent_cache)
    from object_detection_tracking_tpu.tracking.deep_sort import (
        Tracker, create_obj_infos)
    from object_detection_tracking_tpu.tracking.deep_sort.nn_matching import (
        NearestNeighborDistanceMetric)
    from object_detection_tracking_tpu.class_ids import coco_obj_to_actev_obj

    enable_persistent_cache()

    FPS = 30
    FRAME_GAP = 8
    # B=8: measured best end-to-end. (B=32 was tried to amortize the
    # tunnel's fixed per-transfer cost but the 2-deep pipeline already
    # hides it; interleaved A/B showed B=8 >= B=32.)
    BATCH = 8
    BENCH_SECONDS = 48  # 1440 frames -> 180 processed

    tmp = "/tmp/odt_bench"
    os.makedirs(tmp, exist_ok=True)
    warm_path = os.path.join(tmp, "warm.mp4")
    bench_path = os.path.join(tmp, "bench.mp4")
    if not os.path.exists(warm_path):
        make_video(warm_path, FRAME_GAP * BATCH * 2, fps=FPS)
    if not os.path.exists(bench_path):
        make_video(bench_path, BENCH_SECONDS * FPS, fps=FPS)

    cfg = DetectorConfig.coco_partial(
        resnet_depth=50, short_edge_size=720, max_size=1280)
    model = get_model(cfg, "faster_rcnn")
    params = model.init_params(jax.random.PRNGKey(0))
    runner = DetectionRunner(model, params, depth=2)

    classid2name = cfg.classid2name
    coco_map = dict(coco_obj_to_actev_obj)

    def run_video(path, track=True):
        vcap = open_video(path)
        enq = VideoEnqueuer(vcap, 720, 1280, frame_gap=FRAME_GAP,
                            batch_size=BATCH, prefetch=3,
                            pad_last_batch=True, pixel_format="i420")
        trackers = {
            obj: Tracker(NearestNeighborDistanceMetric("cosine", 0.5, 5))
            for obj in ("Person", "Vehicle")}
        n = 0
        rows = 0
        for host, (scale, fidx) in runner.run(
                (imgs, (sc, fi)) for imgs, sc, fi in enq.get()):
            for bi, f in enumerate(fidx):
                if f < 0:
                    continue
                n += 1
                if not track:
                    continue
                for obj, tr in trackers.items():
                    dets = create_obj_infos(
                        host["final_boxes"][bi], host["final_labels"][bi],
                        host["final_probs"][bi], host["pooled_box_feat"][bi],
                        host["final_valid"][bi], classid2name, obj,
                        scale=scale, min_confidence=0.85,
                        coco_to_actev=coco_map)
                    tr.predict()
                    tr.update(dets)
                    rows += sum(t.is_confirmed() for t in tr.tracks)
        return n

    # warmup (compiles both full and last-batch shapes)
    run_video(warm_path, track=False)
    setup_s = time.time() - t_setup

    # measure the host->device tunnel under current load so the end-to-end
    # number is interpretable: the pipeline ships 1.38 MB/frame (I420), so
    # x_realtime is capped near tunnel_MBps / 1.382 / FPS * FRAME_GAP
    probe = np.random.RandomState(0).randint(
        0, 255, (8, 1080, 1280)).astype(np.uint8)
    tunnel = []
    for _ in range(3):
        t0 = time.time()
        d = jax.device_put(probe)
        d.block_until_ready()
        float(np.asarray(d[0, 0, :4].astype(np.float32).sum()))
        tunnel.append(probe.nbytes / (time.time() - t0) / 1e6)
    tunnel_mbps = sorted(tunnel)[1]

    # device-side throughput (input pre-staged on device): what the chip
    # itself sustains when not starved by the tunnel
    staged = jax.device_put(np.zeros((BATCH, 1080, 1280), np.uint8))
    runner._fn(runner.params, staged)  # ensure compiled
    dev = []
    for _ in range(3):
        t0 = time.time()
        out = runner._fn(runner.params, staged)
        float(np.asarray(out.reshape(-1)[:4].astype(np.float32).sum()))
        dev.append(time.time() - t0)
    # subtract one round-trip latency measured with a null op
    nul = jax.jit(lambda v: v + 1)
    float(np.asarray(nul(staged[0, :1, :8]).sum()))
    lats = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(nul(staged[0, :1, :8]).sum()))
        lats.append(time.time() - t0)
    dev_s = max(sorted(dev)[1] - sorted(lats)[1], 1e-3)
    x_rt_device = BATCH * FRAME_GAP / FPS / dev_s

    # the shared TPU service behind the tunnel has up-to-3x wall-clock
    # variance run-to-run; measure 5 passes and report the median
    runs = []
    for _ in range(5):
        t0 = time.time()
        processed = run_video(bench_path, track=True)
        runs.append((time.time() - t0, processed))
    runs.sort()
    elapsed, processed = runs[len(runs) // 2]

    # The reference's MEVA production config (COMMANDS.md:5-14, the
    # 0.49-pAUDC system and the .pb it shipped) runs
    # --rpn_test_post_nms_topk 300; measure it too as a detail (the
    # headline metric stays on the SPEED.md benchmark config, topk 1000).
    cfg300 = DetectorConfig.coco_partial(
        resnet_depth=50, short_edge_size=720, max_size=1280,
        rpn_test_post_nms_topk=300)
    model300 = get_model(cfg300, "faster_rcnn")
    runner300 = DetectionRunner(model300, model300.init_params(
        jax.random.PRNGKey(0)), depth=2)
    main_runner = runner
    runner = runner300
    run_video(warm_path, track=False)
    # interleave with fresh main-config passes: the tunnel/backend load
    # drifts minute-to-minute, so A/B pairs must share conditions
    runs300, runs1000b = [], []
    for _ in range(3):
        t0 = time.time()
        processed300 = run_video(bench_path, track=True)
        runs300.append(time.time() - t0)
        runner = main_runner
        t0 = time.time()
        run_video(bench_path, track=True)
        runs1000b.append(time.time() - t0)
        runner = runner300
    x_rt_300 = (processed300 * FRAME_GAP / FPS / sorted(runs300)[1] *
                # scale to the headline measurement's conditions
                (sorted(runs1000b)[1] / elapsed))

    covered_video_s = processed * FRAME_GAP / FPS
    x_rt = covered_video_s / elapsed
    result = {
        "metric": "det+track x-realtime per chip (1280x720, R50-FPN "
                  "FasterRCNN partial-COCO + DeepSORT, frame_gap 8)",
        "value": round(x_rt, 3),
        "unit": "x_realtime",
        "vs_baseline": round(x_rt / 8.0, 3),
        "detail": {
            "processed_frames": processed,
            "wall_s_median": round(elapsed, 2),
            "wall_s_all": [round(r[0], 2) for r in runs],
            "fps_processed": round(processed / elapsed, 2),
            "setup_s": round(setup_s, 1),
            # zero-egress env: no pretrained checkpoints exist, so the
            # model runs random weights — this measures pipeline speed
            # only, not detection quality (QUALITY_r02.json is the
            # quality proof)
            "weights": "random",
            # context: this chip sits behind a shared ~40-80 MB/s network
            # tunnel; the end-to-end number is transfer-bound at
            # 1.38 MB/frame. x_realtime_device is the chip-side
            # sustained rate with inputs staged in HBM (what a locally
            # attached deployment would see).
            "tunnel_mb_s": round(tunnel_mbps, 1),
            "x_realtime_device": round(x_rt_device, 2),
            # reference production config (rpn topk 300, COMMANDS.md:11),
            # interleaved-A/B vs the headline config and normalized to
            # the headline measurement's backend conditions
            "x_realtime_rpn300": round(x_rt_300, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
