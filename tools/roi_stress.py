"""On-TPU stress sweep for the Pallas ROIAlign (VERDICT r3 weak #1).

The round-3 trained-weights bench pass crashed the TPU worker ("kernel
fault"). The only data-dependent control structure on that path is this
kernel's valid-compacted dynamic trip count plus its DMA origins, which
are computed from box coordinates. This sweep exercises exactly the
distributions the random-weights headline never produces:

  * n_valid in {0, 1, BLK-1, BLK, BLK+1, 30%, 100%} of 8x1000 slots
    (dynamic trip count boundaries);
  * per-level concentration (all ROIs on one pyramid level) and the
    realistic p2-heavy mix;
  * elongated boxes (aspect demotion), degenerate boxes (w=h=0),
    edge-hugging and image-sized boxes;
  * ADVERSARIAL values in both invalid and VALID slots: NaN, +/-inf,
    1e30, negative coords — what a diverging training step or a NaN
    logit feeds the kernel. A NaN that survives `jnp.clip` (NaN
    propagates) and then casts to int32 becomes an undefined DMA origin:
    the prime worker-crash suspect.

Each case checks parity vs the exact XLA gather path on the sane slots
(device-side max-abs-diff reduction, ONE scalar readback — CLAUDE.md
tunnel rule) and mere finiteness/no-crash on adversarial slots.

Usage:  timeout 900 python tools/roi_stress.py [--dtype bf16|f32|both]
Exit 0 = all cases passed. A worker crash aborts the process — the last
"RUN case=..." line printed names the killer.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES_720 = [(180, 320), (90, 160), (45, 80), (23, 40)]
STRIDES = (4, 8, 16, 32)
C = 256
B, N = 8, 1000


def make_boxes(rng, kind, n=N, w_img=1280, h_img=720):
    """[n, 4] x1y1x2y2 image-coord boxes of a given adversarial kind."""
    if kind in ("mix", "edge"):  # realistic p2-heavy proposal mix.
        # Aspect bounded to 1.8: the kernel's exactness envelope (40x48
        # window) — more elongated boxes take the level-demotion path,
        # which intentionally differs from the XLA reference level and is
        # covered by the finiteness-only "elongated" kind.
        w = rng.uniform(8, 300, (n, 1))
        size = np.concatenate([w, w * rng.uniform(0.55, 1.8, (n, 1))], 1)
    elif kind.startswith("level"):
        li = int(kind[-1])
        # canonical extent band for level li: [14, 28) * stride / 4 px
        lo, hi = 14 * STRIDES[li] / 4.0, 27 * STRIDES[li] / 4.0
        size = rng.uniform(lo * 4, hi * 4, (n, 2))
    elif kind == "elongated":  # aspect > 2.8 -> demotion path
        short = rng.uniform(8, 60, (n, 1))
        size = np.concatenate([short, short * rng.uniform(3, 12, (n, 1))],
                              axis=1)
    elif kind == "degenerate":
        size = np.zeros((n, 2))
    elif kind == "huge":
        size = np.tile([[w_img * 0.98, h_img * 0.98]], (n, 1))
    else:
        raise ValueError(kind)
    xy = rng.uniform(0, 1, (n, 2)) * np.maximum(
        [[w_img, h_img]] - size, 1)
    if kind == "edge":
        xy = np.where(rng.uniform(size=(n, 2)) < 0.5, 0.0,
                      [[w_img, h_img]] - size)
    b = np.concatenate([xy, xy + size], axis=1).astype(np.float32)
    return np.clip(b, 0, [w_img, h_img, w_img, h_img]).astype(np.float32)


def poison(boxes, rng, frac=0.1):
    """Overwrite a fraction of rows with NaN/inf/1e30/negative garbage."""
    bad = boxes.copy()
    idx = rng.choice(len(bad), max(1, int(frac * len(bad))), replace=False)
    vals = [np.nan, np.inf, -np.inf, 1e30, -1e6]
    for j, i in enumerate(idx):
        bad[i] = vals[j % len(vals)]
    return bad, idx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="both",
                    choices=["bf16", "f32", "both"])
    ap.add_argument("--quick", action="store_true",
                    help="one dtype, skip per-level concentration cases")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from object_detection_tracking_tpu.ops.pallas import (
        multilevel_roi_align_pallas)
    from object_detection_tracking_tpu.ops.pallas.roi_align_pallas import (
        BLK, multilevel_roi_align_trainable)
    from object_detection_tracking_tpu.ops.roi_align import (
        multilevel_roi_align)

    print(f"backend={jax.default_backend()} BLK={BLK}", flush=True)
    dtypes = {"bf16": jnp.bfloat16, "f32": jnp.float32}
    if args.dtype != "both":
        dtypes = {args.dtype: dtypes[args.dtype]}
    elif args.quick:
        dtypes = {"bf16": jnp.bfloat16}

    rng = np.random.RandomState(0)
    feats_np = [rng.standard_normal((B, h, w, C)).astype(np.float32)
                for (h, w) in SHAPES_720]

    @jax.jit
    def xla_ref(feats, boxes, valid):
        out = jax.vmap(lambda *a: multilevel_roi_align(
            list(a[:-1]), a[-1], STRIDES, 7))(*feats, boxes)
        return jnp.where(valid[:, :, None, None, None], out, 0.0)

    @jax.jit
    def run_pallas(feats, boxes, valid):
        return multilevel_roi_align_pallas(list(feats), boxes, STRIDES, 7,
                                           valid=valid)

    @jax.jit
    def run_train(feats, boxes):  # training path: no valid mask, custom VJP
        return multilevel_roi_align_trainable(tuple(feats), boxes,
                                              STRIDES, 7)

    def maxdiff(a, b, mask):  # device-side reduce, one scalar back
        d = jnp.abs(a - b) * mask[:, :, None, None, None]
        return float(jnp.max(d))

    box_kinds = ["mix", "elongated", "degenerate", "huge", "edge"]
    if not args.quick:
        box_kinds += [f"level{i}" for i in range(4)]
    n_valids = [0, 1, BLK - 1, BLK, BLK + 1, int(0.3 * N), N]

    failures = []
    t0 = time.time()
    for dname, dt in dtypes.items():
        feats = [jnp.asarray(f, dt) for f in feats_np]
        feats32 = [jnp.asarray(f) for f in feats_np]
        atol = 0.15 if dname == "bf16" else 1e-4

        # --- A: n_valid sweep x box kinds, parity vs XLA on valid slots
        for kind in box_kinds:
            boxes = np.stack([make_boxes(np.random.RandomState(s), kind)
                              for s in range(B)])
            for nv in n_valids:
                case = f"{dname}/{kind}/nv={nv}"
                print(f"RUN case={case}", flush=True)
                valid = np.zeros((B, N), bool)
                valid[:, :nv] = True
                out = run_pallas(feats, jnp.asarray(boxes),
                                 jnp.asarray(valid))
                ref = xla_ref(feats32, jnp.asarray(boxes),
                              jnp.asarray(valid))
                d = maxdiff(out, ref, jnp.asarray(valid, jnp.float32))
                # degenerate/elongated boxes take the demotion/clip path:
                # only finiteness is contractual there
                exact = kind in ("mix", "huge", "edge") or \
                    kind.startswith("level")
                bad = (d > atol) if exact else not np.isfinite(
                    float(jnp.sum(jnp.abs(out))))
                if bad:
                    failures.append((case, d))
                    print(f"FAIL case={case} maxdiff={d}", flush=True)

        # --- B: adversarial garbage in INVALID slots (NMS-suppressed
        # slots hold whatever the decode left there)
        boxes = np.stack([make_boxes(np.random.RandomState(s), "mix")
                          for s in range(B)])
        nv = 300
        valid = np.zeros((B, N), bool)
        valid[:, :nv] = True
        bad_boxes = boxes.copy()
        for bi in range(B):
            pb, _ = poison(boxes[bi, nv:], np.random.RandomState(bi), 0.5)
            bad_boxes[bi, nv:] = pb
        case = f"{dname}/poison-invalid"
        print(f"RUN case={case}", flush=True)
        out = run_pallas(feats, jnp.asarray(bad_boxes), jnp.asarray(valid))
        ref = xla_ref(feats32, jnp.asarray(boxes), jnp.asarray(valid))
        d = maxdiff(out, ref, jnp.asarray(valid, jnp.float32))
        if d > atol:
            failures.append((case, d))
            print(f"FAIL case={case} maxdiff={d}", flush=True)

        # --- C: adversarial garbage in VALID slots (diverged training /
        # NaN logits). Contract: NO CRASH, sane slots still exact, bad
        # slots return *finite or NaN* values but never fault the worker.
        case = f"{dname}/poison-valid"
        print(f"RUN case={case}", flush=True)
        bad_boxes = boxes.copy()
        bad_idx = []
        for bi in range(B):
            pb, idx = poison(boxes[bi, :nv], np.random.RandomState(99 + bi),
                             0.2)
            bad_boxes[bi, :nv] = pb
            bad_idx.append(idx)
        out = run_pallas(feats, jnp.asarray(bad_boxes), jnp.asarray(valid))
        ref = xla_ref(feats32, jnp.asarray(bad_boxes), jnp.asarray(valid))
        sane = valid.copy()
        for bi in range(B):
            sane[bi, bad_idx[bi]] = False
        d = maxdiff(out, ref, jnp.asarray(sane, jnp.float32))
        if d > atol:
            failures.append((case, d))
            print(f"FAIL case={case} sane-slot maxdiff={d}", flush=True)

        # --- D: training path (no valid mask, custom VJP fwd) with and
        # without poison — the bench's 450-step training loop runs this.
        for pname, bx in [("clean", boxes), ("poison", bad_boxes)]:
            case = f"{dname}/train-fwd/{pname}"
            print(f"RUN case={case}", flush=True)
            out = run_train(feats, jnp.asarray(bx[:, :512]))
            s = float(jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0)))
            assert np.isfinite(s), case

    ok = not failures
    print(f"{'PASS' if ok else 'FAIL'}: roi_stress "
          f"{len(dtypes)} dtypes x {len(box_kinds)} kinds x "
          f"{len(n_valids)} n_valids in {time.time() - t0:.0f}s "
          f"failures={failures}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
