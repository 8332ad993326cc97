"""Stage-level wall-clock profile of the detector on the real TPU.

Times each pipeline stage with forced device->host readbacks (on the
axon tunnel `block_until_ready` returns early, CLAUDE.md) at bench shape
(720p, B=8, bf16 R50-FPN partial-COCO). Use to find the current
bottleneck before touching kernels.

  python tools/profile_pipeline.py [--batch 8] [--reps 5]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync(x):
    import jax
    leaves = jax.tree.leaves(x)
    return float(np.asarray(leaves[0].sum()))


def timeit(fn, reps):
    outs = fn()  # warm/compile
    sync(outs)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        outs = fn()
        sync(outs)
        ts.append(time.time() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from object_detection_tracking_tpu.config import DetectorConfig
    from object_detection_tracking_tpu.models import get_model

    cfg = DetectorConfig.coco_partial(
        resnet_depth=50, short_edge_size=args.height, max_size=args.width)
    model = get_model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    b, h, w = args.batch, args.height, args.width
    images = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (b, h, w, 3), np.uint8))
    hp, wp, fields, valids = model._static_geometry(h, w)

    # stage closures (each jit'd separately; inputs pre-staged on device)
    pre = jax.jit(lambda im: model.preprocess(im, hp, wp))
    p_images = pre(images); sync(p_images)

    backbone = jax.jit(lambda p, x: model.backbone(p, x))
    p23456 = backbone(params, p_images); [sync(t) for t in p23456]

    rpn = jax.jit(lambda p, f: model._rpn_all_levels(p, f))
    ll, bl = rpn(params, p23456)

    def props_fn():
        return jax.vmap(
            lambda *lv: model._proposals_single(
                lv[:cfg.num_levels], lv[cfg.num_levels:], fields, valids,
                h, w))(*ll, *bl)
    props_j = jax.jit(props_fn)
    prop_boxes, prop_valid = props_j()

    roi = jax.jit(lambda f, bx: model._roi_align_batched(f, bx, 7))
    roi_feats = roi(p23456, prop_boxes)

    head = jax.jit(lambda p, rf, bx: model._apply_head(p, rf, bx))

    full = jax.jit(model.forward)

    stages = {
        "preprocess": lambda: pre(images),
        "backbone+fpn": lambda: backbone(params, p_images),
        "rpn_heads": lambda: rpn(params, p23456),
        "proposals(topk+nms)": lambda: props_j(),
        "roi_align(8x1000)": lambda: roi(p23456, prop_boxes),
        "box_head": lambda: head(params, roi_feats, prop_boxes),
        "FULL forward": lambda: full(params, images),
    }
    flops = None
    try:
        c = jax.jit(model.forward).lower(params, images).compile()
        flops = (c.cost_analysis() or {}).get("flops")
    except Exception:
        pass

    print(f"shape B={b} {h}x{w} dtype={cfg.compute_dtype} "
          f"roi_impl={cfg.roi_align_impl}")
    total = 0.0
    for name, fn in stages.items():
        best, med = timeit(fn, args.reps)
        if name != "FULL forward":
            total += best
        print(f"{name:24s} best {best*1e3:8.2f} ms   median {med*1e3:8.2f} ms")
    print(f"{'sum(stages)':24s} best {total*1e3:8.2f} ms")
    if flops:
        print(f"full-forward FLOPs: {flops/1e12:.3f} TF")


if __name__ == "__main__":
    main()
