"""Amortized device-side forward timing, immune to tunnel noise.

Host-side timing of a single jitted call through the tunneled backend has
~±15 ms of latency jitter — bigger than most stage-level effects. This
tool instead runs the WHOLE forward N times inside one jit (lax.fori_loop,
input perturbed per iteration so nothing hoists), reads back one scalar,
and reports (T(N) - T(1)) / (N - 1): per-batch device time with the
tunnel round-trip cancelled.

Usage:
  python tools/device_bench.py [--batch 8] [--iters 6] \
      [--roi pallas|xla] [--dtype bfloat16|float32] [--depth 50]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--roi", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--detector", default="rcnn",
                    help="'rcnn' or an efficientdet name (e.g. "
                         "efficientdet-d0, bench at its native square "
                         "size; VERDICT r3 missing #4 — EffDet TPU perf "
                         "was unmeasured)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stage", default="full",
                    choices=["pre", "backbone", "rpn", "proposals",
                             "roi_pro", "roi", "full"],
                    help="time the forward PREFIX up to this stage "
                         "(cumulative; subtract successive stages)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from object_detection_tracking_tpu.config import DetectorConfig
    from object_detection_tracking_tpu.models import get_model
    from object_detection_tracking_tpu.runtime import enable_persistent_cache

    enable_persistent_cache()
    if args.detector.startswith("efficientdet"):
        cfg = DetectorConfig.coco_partial(
            resnet_depth=args.depth, roi_align_impl=args.roi,
            compute_dtype=args.dtype)
        cfg = cfg.__class__(**{**cfg.__dict__, "model": "efficientdet",
                               "efficientdet_name": args.detector})
        model = get_model(cfg, "efficientdet")
        s = model.image_size
        imgs = jax.device_put(np.random.RandomState(0).randint(
            0, 255, (args.batch, s, s, 3), np.uint8))
        params = model.init_params(jax.random.PRNGKey(0))

        def prefix_eff(img):
            out = model.forward(params, img)
            return jnp.sum(out["final_probs"].astype(jnp.float32))
    else:
        cfg = DetectorConfig.coco_partial(
            resnet_depth=args.depth, short_edge_size=720, max_size=1280,
            roi_align_impl=args.roi, compute_dtype=args.dtype)
        model = get_model(cfg, "faster_rcnn")
        params = model.init_params(jax.random.PRNGKey(0))
        imgs = jax.device_put(np.random.RandomState(0).randint(
            0, 255, (args.batch, 1080, 1280), np.uint8))

    def prefix(img):
        """model.forward up to --stage (mirrors forward's structure)."""
        if args.detector.startswith("efficientdet"):
            return prefix_eff(img)
        cfg2 = model.config
        h, w = 720, 1280
        hp, wp, fields, valids = model._static_geometry(h, w)
        x = model.preprocess(img, hp, wp, s2d=True)
        if args.stage == "pre":
            return jnp.sum(x.astype(jnp.float32))
        p23456 = model.backbone(params, x)
        if args.stage == "backbone":
            return sum(jnp.sum(p.astype(jnp.float32)) for p in p23456)
        label_logits, box_logits = model._rpn_all_levels(params, p23456)
        if args.stage == "rpn":
            return sum(jnp.sum(l.astype(jnp.float32)) for l in label_logits)
        p23456, label_logits, box_logits = jax.lax.optimization_barrier(
            (p23456, label_logits, box_logits))
        prop_boxes, prop_valid = jax.vmap(
            lambda *lv: model._proposals_single(
                lv[:cfg2.num_levels], lv[cfg2.num_levels:], fields, valids,
                h, w))(*label_logits, *box_logits)
        if args.stage == "proposals":
            return jnp.sum(prop_boxes) + jnp.sum(prop_valid)
        if args.stage == "roi_pro":
            # ROIAlign XLA prologue only (no Pallas kernel): levels ready
            # + meta + packed weights — isolates prologue vs kernel cost
            from object_detection_tracking_tpu.ops.pallas.roi_align_pallas \
                import _prepare_roi_align
            cdt = jnp.dtype(cfg2.compute_dtype)
            feats = [p.astype(cdt) for p in p23456[:4]]
            lb, meta_i, wyx, _, inv = _prepare_roi_align(
                feats, prop_boxes, (4, 8, 16, 32), 7, None, prop_valid)
            return (sum(jnp.sum(x[:, -1].astype(jnp.float32)) for x in lb)
                    + jnp.sum(meta_i) + jnp.sum(wyx) + jnp.sum(inv))
        roi_feats = model._roi_align_batched(p23456, prop_boxes, 7,
                                             valid=prop_valid)
        if args.stage == "roi":
            return jnp.sum(roi_feats.astype(jnp.float32))
        out = model.forward(params, img)
        return jnp.sum(out["final_probs"].astype(jnp.float32))

    def make_loop(n):
        @jax.jit
        def f(images):
            def body(i, acc):
                img = images + (i % 2).astype(jnp.uint8)  # defeat hoisting
                return acc + prefix(img)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return f

    def timed(f, reps):
        float(f(imgs))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f(imgs))
            ts.append(time.time() - t0)
        return min(ts)

    f1, fn = make_loop(1), make_loop(args.iters)
    t1 = timed(f1, args.reps)
    tn = timed(fn, args.reps)
    per_batch = (tn - t1) / (args.iters - 1)
    per_frame = per_batch / args.batch
    x_rt = 8.0 / 30.0 / per_frame  # frame_gap 8, 30 fps
    desc = (f"{args.detector}@{model.image_size}"
            if args.detector.startswith("efficientdet")
            else f"roi={args.roi} depth={args.depth}")
    print(f"{desc} dtype={args.dtype} "
          f"B={args.batch}: {per_batch*1e3:.1f} ms/batch "
          f"{per_frame*1e3:.2f} ms/frame  ({x_rt:.1f}x realtime @gap8, "
          f"T1={t1*1e3:.0f} ms TN={tn*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
