"""Measure packed-artifact cold-start: pack -> NEW process -> first batch.

The reference ships frozen .pb graphs for +30% runtime and fast startup
(models.py:134-191, SPEED.md:65-66). The XLA-native equivalent here is
``cli.main pack`` (params.npz + config.json + forward.jaxexport) plus the
persistent compile cache. This tool quantifies the claim, timing the first
inference batch in a FRESH python process under three regimes:

  fresh    — no compile cache: load pack, trace-free jax.export call,
             XLA still compiles the StableHLO for this backend;
  warm     — persistent compile cache populated: load pack, the compile
             step is a disk hit;
  live     — no pack: rebuild the model Python, jit, compile from scratch
             (what a non-packed deployment pays).

Usage: python tools/pack_coldstart.py [--short_edge 360] [--out json]
Writes one JSON line; record the numbers in COMPONENTS.md.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, ".")

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
t0 = time.time()
import numpy as np
regime = sys.argv[1]
pack_dir = sys.argv[2]
hw = json.loads(sys.argv[3])
if regime == "warm":
    from object_detection_tracking_tpu.runtime import enable_persistent_cache
    enable_persistent_cache(os.environ["ODT_COLD_CACHE"])
img = np.random.RandomState(0).randint(
    0, 255, (1, hw[0], hw[1], 3), np.uint8)
t_load0 = time.time()
if regime == "live":
    from object_detection_tracking_tpu.cli.main import get_args, build
    from object_detection_tracking_tpu.utils.weights import load_npz_tree
    import jax
    a = get_args(json.loads(sys.argv[4]))
    cfg, model = build(a, is_train=False)
    params = load_npz_tree(os.path.join(pack_dir, "params.npz"))
    fn = jax.jit(model.forward)
else:
    from object_detection_tracking_tpu.runtime.aot import load_packed
    cfg, params, fn = load_packed(pack_dir)
t_first0 = time.time()
out = fn(params, img)
float(np.asarray(out["final_boxes"]).sum())  # force readback
t_done = time.time()
print(json.dumps({"regime": regime,
                  "import_s": round(t_load0 - t0, 2),
                  "load_s": round(t_first0 - t_load0, 2),
                  "first_batch_s": round(t_done - t_first0, 2),
                  "total_s": round(t_done - t0, 2)}))
"""


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--short_edge", type=int, default=360)
    ap.add_argument("--max_size", type=int, default=640)
    ap.add_argument("--out", default=None)
    ap.add_argument("--repeats", type=int, default=3,
                    help="children per regime; medians are reported "
                         "(backend wall-clock varies up to 3x)")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="odt_cold_")
    cache = os.path.join(tmp, "xla_cache")
    pack_argv = [
        "pack", "--outbasepath", tmp, "--modelname", "cold",
        "--version", "2", "--num_class", "4",
        "--short_edge_size", str(args.short_edge),
        "--max_size", str(args.max_size),
        "--rpn_test_post_nms_topk", "300", "--result_per_im", "100"]
    from object_detection_tracking_tpu.cli import main as driver
    t0 = time.time()
    driver.main(pack_argv)
    pack_s = time.time() - t0
    pack_dir = os.path.join(tmp, "cold", "packed")

    # non-warm regimes must be genuinely cold: drop any ambient jax
    # compile-cache config the parent session may carry, and point the
    # default cache at an EMPTY scratch dir — load_packed now merges the
    # pack's shipped executable cache into the active cache, so "fresh"
    # measures exactly (pack contents + nothing else), not whatever the
    # parent's user cache happened to hold
    fresh_cache = os.path.join(tmp, "fresh_scratch_cache")
    os.makedirs(fresh_cache, exist_ok=True)
    env = dict(os.environ, ODT_COLD_CACHE=cache,
               ODT_COMPILE_CACHE=fresh_cache)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    hw = json.dumps([args.short_edge, args.max_size])
    live_argv = json.dumps(["forward", "--load_from", "x"] + pack_argv[1:])

    def child(regime):
        p = subprocess.run(
            [sys.executable, "-c", CHILD, regime, pack_dir, hw, live_argv],
            capture_output=True, text=True, env=env,
            timeout=int(os.environ.get("ODT_COLD_CHILD_TIMEOUT", 900)))
        if p.returncode != 0:
            raise RuntimeError(f"{regime} child rc={p.returncode}: "
                               f"{p.stderr[-2000:]}")
        r = json.loads(p.stdout.strip().splitlines()[-1])
        print("child:", json.dumps(r), flush=True)  # stream partials
        return r

    def median_of(regime, n):
        runs = sorted((child(regime) for _ in range(n)),
                      key=lambda r: r["total_s"])
        med = dict(runs[len(runs) // 2])
        med["total_s_all"] = [r["total_s"] for r in runs]
        return med

    results = {"pack_s": round(pack_s, 2)}
    results["fresh"] = median_of("fresh", args.repeats)
    results["warm_populate"] = child("warm")   # fills the cache
    results["warm"] = median_of("warm", args.repeats)
    results["live"] = median_of("live", args.repeats)
    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
