"""Per-group device timing of the R50 backbone+FPN (VERDICT r3 #5).

backbone+FPN is ~20 ms of the 39 ms full batch at ~10-15% MFU; this tool
times each resnet group (stem, c2..c5, fpn) with the same amortized
in-jit fori_loop trick as tools/device_bench.py (tunnel round-trip
cancelled, one scalar readback), plus a FLOP/byte model per group so the
gap to roofline is visible per stage.

Usage: python tools/backbone_bench.py [--batch 8] [--iters 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from object_detection_tracking_tpu.config import DetectorConfig
    from object_detection_tracking_tpu.models import get_model
    from object_detection_tracking_tpu.models.fpn import fpn_model
    from object_detection_tracking_tpu.models.resnet import (
        _stem_conv_s2d, resnet_group)
    from object_detection_tracking_tpu.models.layers import max_pool
    from object_detection_tracking_tpu.ops.norm import bn_relu
    from object_detection_tracking_tpu.runtime import enable_persistent_cache

    enable_persistent_cache()
    cfg = DetectorConfig.coco_partial(
        resnet_depth=50, short_edge_size=720, max_size=1280,
        compute_dtype=args.dtype)
    model = get_model(cfg, "faster_rcnn")
    params = model.init_params(jax.random.PRNGKey(0))
    rp = params["resnet"]
    b = args.batch
    hp, wp = 736, 1280
    dt = jnp.dtype(args.dtype)
    num_blocks = (3, 4, 6, 3)

    x0 = jax.device_put(np.random.RandomState(0).standard_normal(
        (b, hp // 2, wp // 2, 12)).astype(dt))  # s2d preprocess output

    def stem(x):
        l = _stem_conv_s2d(rp["conv0"], x)
        l = bn_relu(rp["conv0"]["bn"], l)
        return max_pool(l, 3, 2, padding=((1, 0), (1, 0)))

    def group(i):
        def f(x):
            return resnet_group(rp[f"group{i}"], x, num_blocks[i],
                                1 if i == 0 else 2, 1, False, False, False)
        return f

    def fpn(feats):
        return fpn_model(params["fpn"], list(feats))

    # build the stage inputs by running the prefix once
    c1 = jax.jit(stem)(x0)
    feats = [c1]
    for i in range(4):
        feats.append(jax.jit(group(i))(feats[-1]))
    c2345 = feats[1:]

    def fused_group(i):
        from object_detection_tracking_tpu.models.resnet import bottleneck
        from object_detection_tracking_tpu.ops.pallas.resnet_stage_pallas \
            import fused_bottleneck_stage
        feat = (64, 128, 256, 512)[i]
        gp = rp[f"group{i}"]
        blocks = [gp[f"block{bi}"] for bi in range(num_blocks[i])]

        def f(x):
            start = 0
            if i > 0:
                x = bottleneck(blocks[0], x, 2, 1, False, False)
                start = 1
            rest = blocks[start:]
            j = 0
            while j < len(rest):
                x = fused_bottleneck_stage(rest[j:j + 3], x, feat, feat * 4)
                j += len(rest[j:j + 3])
            return x
        return f

    stages = [("stem+pool", stem, x0), ("c2", group(0), c1),
              ("c2 fused", fused_group(0), c1),
              ("c3", group(1), c2345[0]),
              ("c3 fused", fused_group(1), c2345[0]),
              ("c4", group(2), c2345[1]),
              ("c4 fused", fused_group(2), c2345[1]),
              ("c5", group(3), c2345[2]),
              ("c5 fused", fused_group(3), c2345[2]),
              ("fpn", fpn, c2345)]

    # parity spot-check on device (c2)
    ref = jax.jit(group(0))(c1)
    got = jax.jit(fused_group(0))(c1)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                got.astype(jnp.float32))))
    rel = err / (float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9)
    print(f"c2 fused parity max|diff| = {err:.4g} (rel {rel:.3g})")

    def timeit(fn, inp, n):
        is_list = isinstance(inp, (list, tuple))

        @jax.jit
        def loop(v):
            def body(i, acc):
                if is_list:
                    vv = [t + (i % 2).astype(t.dtype) for t in v]
                else:
                    vv = v + (i % 2).astype(v.dtype)
                o = fn(vv)
                if isinstance(o, (list, tuple)):
                    return acc + sum(
                        jnp.sum(t.astype(jnp.float32)) for t in o)
                return acc + jnp.sum(o.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(loop(inp))
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            float(loop(inp))
            ts.append(time.time() - t0)
        return min(ts)

    print(f"B={b} {hp}x{wp} dtype={args.dtype}")
    total = 0.0
    for name, fn, inp in stages:
        t1 = timeit(fn, inp, 1)
        tn = timeit(fn, inp, args.iters)
        per = (tn - t1) / (args.iters - 1)
        total += per
        print(f"{name:10s} {per*1e3:7.2f} ms")
    print(f"{'SUM':10s} {total*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
