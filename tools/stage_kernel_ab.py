"""Focused A/B of the fused bottleneck-stage kernel variants on one
group's shapes (default c2 at 720p B=8), single process. The kernel
reads ODT_STAGE_IMPL / ODT_STAGE_ABLATE at trace time, so variants are
re-traced after mutating os.environ.

Usage: python tools/stage_kernel_ab.py [--group 0] [--iters 8]
"""

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", type=int, default=0)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default="xla,concat,splitk,stackn,noshift")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from object_detection_tracking_tpu.config import DetectorConfig
    from object_detection_tracking_tpu.models import get_model
    from object_detection_tracking_tpu.models.resnet import (bottleneck,
                                                             resnet_group)
    from object_detection_tracking_tpu.ops.pallas.resnet_stage_pallas \
        import fused_bottleneck_stage
    from object_detection_tracking_tpu.runtime import enable_persistent_cache
    enable_persistent_cache()

    gi = args.group
    cfg = DetectorConfig.coco_partial(resnet_depth=50, short_edge_size=720,
                                      max_size=1280)
    model = get_model(cfg, "faster_rcnn")
    rp = model.init_params(jax.random.PRNGKey(0))["resnet"]
    num_blocks = (3, 4, 6, 3)
    feat = (64, 128, 256, 512)[gi]
    h, w, c = {0: (184, 320, 64), 1: (184, 320, 256), 2: (92, 160, 512),
               3: (46, 80, 1024)}[gi]
    x = jax.device_put(np.random.RandomState(0).standard_normal(
        (8, h, w, c)).astype(np.float32).astype(jnp.bfloat16))
    gp = rp[f"group{gi}"]
    blocks = [gp[f"block{bi}"] for bi in range(num_blocks[gi])]

    def xla_fn(v):
        return resnet_group(gp, v, num_blocks[gi], 1 if gi == 0 else 2, 1,
                            False, False, False)

    def fused_fn(v):
        start = 0
        if gi > 0:
            v = bottleneck(blocks[0], v, 2, 1, False, False)
            start = 1
        rest = blocks[start:]
        j = 0
        while j < len(rest):
            v = fused_bottleneck_stage(rest[j:j + 3], v, feat, feat * 4)
            j += len(rest[j:j + 3])
        return v

    def timeit(fn, inp, n):
        @jax.jit
        def loop(v):
            def body(i, acc):
                o = fn(v + (i % 2).astype(v.dtype))
                return acc + jnp.sum(o.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(loop(inp))
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            float(loop(inp))
            ts.append(time.time() - t0)
        return min(ts)

    for v in args.variants.split(","):
        os.environ["ODT_STAGE_IMPL"] = v if v not in ("xla", "noshift") \
            else "concat"
        os.environ["ODT_STAGE_ABLATE"] = "noshift" if v == "noshift" else ""
        fn = xla_fn if v == "xla" else fused_fn
        t1 = timeit(fn, x, 1)
        tn = timeit(fn, x, args.iters)
        per = (tn - t1) / (args.iters - 1)
        print(f"group{gi} {v:10s} {per * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
