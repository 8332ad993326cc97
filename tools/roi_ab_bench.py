"""Interleaved A/B timing for the Pallas ROIAlign kernel variants.

The shared TPU backend's wall-clock varies up to 3x with load (CLAUDE.md),
so absolute kernel timings are meaningless; this driver interleaves
variants round-robin across subprocesses (each variant re-imports the
kernel module with ODT_ROI_* env overrides) and reports per-variant
medians from the same time window.

  python tools/roi_ab_bench.py [--reps 3]

Variants are (name, env) pairs in VARIANTS below; edit to taste.
"""

import argparse
import json
import os
import subprocess
import sys

VARIANTS = [
    ("xla-weights-b2n2", {}),
    ("blk4", {"ODT_ROI_BLK": "4"}),
    ("blk8", {"ODT_ROI_BLK": "8"}),
    ("blk4-nbuf4", {"ODT_ROI_BLK": "4", "ODT_ROI_NBUF": "4"}),
    ("ablate-mm-DIAGNOSTIC", {"ODT_ROI_ABLATE_MM": "1"}),  # wrong results
]

_CHILD = r"""
import time, sys
import numpy as np
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp
from object_detection_tracking_tpu.runtime import enable_persistent_cache
enable_persistent_cache()
from object_detection_tracking_tpu.ops.pallas.roi_align_pallas import (
    multilevel_roi_align_pallas)

B, N, C = 8, 1000, 256
strides = [4, 8, 16, 32]
shapes = [(184, 320), (92, 160), (46, 80), (23, 40)]
rng = np.random.RandomState(0)
feats = [jnp.asarray(rng.randn(B, h, w, C), jnp.bfloat16) for h, w in shapes]
area = (rng.uniform(16, 448, (B, N))) ** 2
aspect = np.exp(rng.uniform(np.log(0.4), np.log(2.5), (B, N)))
bh = np.sqrt(area * aspect); bw = np.sqrt(area / aspect)
cx = rng.uniform(0, 1280, (B, N)); cy = rng.uniform(0, 720, (B, N))
boxes = np.stack([cx - bw/2, cy - bh/2, cx + bw/2, cy + bh/2], -1)
boxes[..., 0::2] = boxes[..., 0::2].clip(0, 1279)
boxes[..., 1::2] = boxes[..., 1::2].clip(0, 719)
boxes = jnp.asarray(boxes, jnp.float32)
fn = jax.jit(lambda f, b: multilevel_roi_align_pallas(f, b, strides, 7))
out = fn(feats, boxes)
float(np.asarray(out[..., 0].astype(jnp.float32)).sum())
nul = jax.jit(lambda v: v + 1)
float(np.asarray(nul(boxes).sum()))
lats, ts = [], []
for _ in range(3):
    t0 = time.time(); float(np.asarray(nul(boxes).sum()))
    lats.append(time.time() - t0)
for _ in range(5):
    t0 = time.time()
    out = fn(feats, boxes)
    float(np.asarray(out[..., 0].astype(jnp.float32)).sum())
    ts.append(time.time() - t0)
ts = sorted(ts); lat = sorted(lats)[1]
print("RESULT", ts[2] - lat, ts[0] - lat)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {name: [] for name, _ in VARIANTS}
    for rep in range(args.reps):
        for name, env in VARIANTS:
            child_env = dict(os.environ, **env)
            out = subprocess.run(
                [sys.executable, "-c", _CHILD % {"repo": repo}],
                capture_output=True, text=True, env=child_env, timeout=900)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("RESULT")]
            if not line:
                print(f"rep{rep} {name}: FAILED\n{out.stderr[-2000:]}")
                continue
            med, best = map(float, line[0].split()[1:])
            results[name].append(med)
            print(f"rep{rep} {name}: net-median {med*1e3:.1f} ms "
                  f"(best {best*1e3:.1f})")
    print(json.dumps({
        k: round(sorted(v)[len(v) // 2] * 1e3, 1) if v else None
        for k, v in results.items()}))


if __name__ == "__main__":
    main()
