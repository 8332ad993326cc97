"""Per-conv timing + formulation A/Bs for the narrow-channel c2 stage.

VERDICT r3 #5: c2 (3 bottleneck blocks at 184x320, widths 64->256) runs
5.0 ms of the 19.6 ms backbone+FPN while its FLOP bound is ~1.0 ms and
its HBM roofline ~2.4 ms. This tool times every conv of the group in
isolation (amortized in-jit fori_loop, one-scalar readback — see
tools/device_bench.py) and A/Bs alternative formulations so the attack
picks the real bottleneck, not a guess.

Usage: python tools/c2_bench.py [--batch 8] [--iters 16] [--reps 3]
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
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--only", default=None, help="substring filter")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from object_detection_tracking_tpu.runtime import enable_persistent_cache

    enable_persistent_cache()
    b = args.batch
    h, w = 184, 320
    dt = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)

    def t_amortized(fn, x, label):
        """(T(iters) - T(1)) / (iters - 1) with the tunnel RTT cancelled."""
        def loop(n):
            def body(i, carry):
                y = fn(carry)
                # feed a perturbed scalar back so nothing hoists
                return carry + (y.sum() * 1e-12).astype(carry.dtype)

            out = jax.lax.fori_loop(0, n, body, x)
            return jnp.float32(out.sum())

        f1 = jax.jit(lambda v: loop(1))
        fn_ = jax.jit(lambda v: loop(args.iters))
        float(f1(x))
        float(fn_(x))
        best = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(f1(x))
            t1 = time.perf_counter()
            float(fn_(x))
            t2 = time.perf_counter()
            best.append(((t2 - t1) - (t1 - t0)) / (args.iters - 1))
        ms = sorted(best)[len(best) // 2] * 1e3
        print(f"{label:42s} {ms:7.3f} ms")
        return ms

    def conv(x, kernel, c_out, stride=1, groups=1):
        c_in = x.shape[-1]
        wk = jnp.asarray(rng.standard_normal(
            (kernel, kernel, c_in // groups, c_out)) * 0.05, dt)
        pad = "SAME" if stride == 1 else ((1, 0), (1, 0))
        return jax.lax.conv_general_dilated(
            x, wk, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups, preferred_element_type=dt)

    x256 = jnp.asarray(rng.standard_normal((b, h, w, 256)) * 0.1, dt)
    x64 = jnp.asarray(rng.standard_normal((b, h, w, 64)) * 0.1, dt)

    cases = {
        # isolated convs of a c2 bottleneck (blocks 1-2 shape)
        "1x1 256->64": (lambda v: conv(v, 1, 64), x256),
        "3x3 64->64": (lambda v: conv(v, 3, 64), x64),
        "1x1 64->256": (lambda v: conv(v, 1, 256), x64),
        # formulation A/Bs for the 1x1s: explicit matmul
        "1x1 256->64 as dot": (
            lambda v: jnp.einsum(
                "bhwc,cd->bhwd", v,
                jnp.asarray(rng.standard_normal((256, 64)) * 0.05, dt),
                preferred_element_type=dt), x256),
        "1x1 64->256 as dot": (
            lambda v: jnp.einsum(
                "bhwc,cd->bhwd", v,
                jnp.asarray(rng.standard_normal((64, 256)) * 0.05, dt),
                preferred_element_type=dt), x64),
        # 3x3 as 9 shifted matmuls (no im2col materialization)
        "3x3 64->64 as 9 dots": (lambda v: _shift9(v, dt, rng), x64),
        # fused block: conv1+relu+conv2+relu+conv3+add+relu, XLA graph
        "full block (xla graph)": (lambda v: _block(v, dt, rng, conv), x256),
        # widened alternative: fold the three convs' FLOPs into one wide
        # matmul chain at C=256 to see the MXU ceiling for this shape
        "ceiling: 1x1 256->256 dot": (
            lambda v: jnp.einsum(
                "bhwc,cd->bhwd", v,
                jnp.asarray(rng.standard_normal((256, 256)) * 0.05, dt),
                preferred_element_type=dt), x256),
        "ceiling: copy 256ch": (lambda v: v * jnp.asarray(1.0001, dt), x256),
    }

    import jax  # noqa: F811

    for label, (fn, x) in cases.items():
        if args.only and args.only not in label:
            continue
        t_amortized(fn, x, label)


def _shift9(v, dt, rng):
    import jax.numpy as jnp
    ws = jnp.asarray(rng.standard_normal((9, 64, 64)) * 0.05, dt)
    pad = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = v.shape[1:3]
    out = None
    k = 0
    for dy in range(3):
        for dx in range(3):
            t = jnp.einsum("bhwc,cd->bhwd", pad[:, dy:dy + h, dx:dx + w, :],
                           ws[k], preferred_element_type=dt)
            out = t if out is None else out + t
            k += 1
    return out


def _block(v, dt, rng, conv):
    import jax
    l = jax.nn.relu(conv(v, 1, 64))
    l = jax.nn.relu(conv(l, 3, 64))
    l = conv(l, 1, 256)
    return jax.nn.relu(l + v)


if __name__ == "__main__":
    main()
