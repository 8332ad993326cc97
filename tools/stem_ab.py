"""A/B the stem stages (s2d conv0 / bn_relu / maxpool) on the TPU.

Same amortized in-jit fori_loop protocol as tools/backbone_bench.py:
device-side reduce, ONE scalar readback (CLAUDE.md tunnel rule).

Usage: python tools/stem_ab.py [--batch 8] [--iters 8] [--reps 3]
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
    from object_detection_tracking_tpu.models.resnet import _stem_conv_s2d
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

    x0 = jax.device_put(np.random.RandomState(0).standard_normal(
        (b, hp // 2, wp // 2, 12)).astype(dt))

    def conv_only(x):
        return _stem_conv_s2d(rp["conv0"], x)

    def conv_bn(x):
        return bn_relu(rp["conv0"]["bn"], conv_only(x))

    def full(x):
        return max_pool(conv_bn(x), 3, 2, padding=((1, 0), (1, 0)))

    c_out = jax.jit(conv_bn)(x0)

    def pool_only(y):
        return max_pool(y, 3, 2, padding=((1, 0), (1, 0)))

    def pool_fast(y):
        # 3x3/2 pad((1,0),(1,0)) maxpool via FREE minor-dim reshapes:
        # cols pair into 2C lanes (W,C adjacent in linear order), rows
        # split as a major dim — then 3-way elementwise maxes. No
        # reduce_window, no strided slices, no relayout.
        bb, hh, ww, cc = y.shape
        neg = jnp.asarray(-jnp.inf, y.dtype)
        t = y.reshape(bb, hh, ww // 2, 2 * cc)
        a, b2 = t[..., :cc], t[..., cc:]
        bl = jnp.concatenate(
            [jnp.full((bb, hh, 1, cc), neg, y.dtype), b2[:, :, :-1]], axis=2)
        cm = jnp.maximum(jnp.maximum(bl, a), b2)
        u = cm.reshape(bb, hh // 2, 2, ww // 2, cc)
        r0, r1 = u[:, :, 0], u[:, :, 1]
        r1l = jnp.concatenate(
            [jnp.full((bb, 1, ww // 2, cc), neg, y.dtype), r1[:, :-1]],
            axis=1)
        return jnp.maximum(jnp.maximum(r1l, r0), r1)

    def full_fast(x):
        return pool_fast(conv_bn(x))

    # parity of the reshape-pool vs reduce_window
    pref = jax.jit(pool_only)(c_out)
    pgot = jax.jit(pool_fast)(c_out)
    import numpy as _np
    perr = float(jnp.max(jnp.abs(pref.astype(jnp.float32) -
                                 pgot.astype(jnp.float32))))
    print(f"pool_fast parity max|diff| = {perr:.4g} "
          f"({pgot.shape} vs {pref.shape})")

    variants = [("conv", conv_only, x0), ("conv+bn_relu", conv_bn, x0),
                ("pool(conv_out)", pool_only, c_out),
                ("pool_fast(conv_out)", pool_fast, c_out),
                ("full stem", full, x0),
                ("full stem fastpool", full_fast, x0)]

    # optional: fused pallas stem if present
    try:
        from object_detection_tracking_tpu.ops.pallas.stem_pallas import (
            stem_conv_pool_pallas)

        def fused(x):
            return stem_conv_pool_pallas(rp["conv0"], x)
        variants.append(("pallas fused", fused, x0))
        # parity check once
        ref = jax.jit(full)(x0)
        got = jax.jit(fused)(x0)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                    got.astype(jnp.float32))))
        print(f"pallas parity max|diff| = {err:.4g} "
              f"(out {got.shape} vs {ref.shape})")
    except ImportError:
        pass

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

    print(f"B={b} {hp}x{wp} dtype={args.dtype}")
    for name, fn, inp in variants:
        t1 = timeit(fn, inp, 1)
        tn = timeit(fn, inp, args.iters)
        per = (tn - t1) / (args.iters - 1)
        print(f"{name:16s} {per*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
