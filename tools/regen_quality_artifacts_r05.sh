#!/bin/bash
# Round-5 artifact queue: regenerate every committed quality artifact at
# the CURRENT source tree, in HARD mode where supported (VERDICT r4 #2),
# ordered so a tunnel wedge or deadline costs the least-critical artifact.
#
#  1. EffDet train->AP gate (the r04 red artifact — top VERDICT item)
#  2. detection quality, HARD scenes, 4000 steps
#  3. tracking quality, HARD scenes, both trackers, raised per-class
#     floor, tuned + reference-parity configs recorded
#  4. mask quality (generator has no hard+mask mode; box-level hard gt
#     only) — last, least round-critical
#
# Usage: bash tools/regen_quality_artifacts_r05.sh [round_tag]
set -u
TAG=${1:-r05}
cd "$(dirname "$0")/.."
PY="python -u -m"

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 3600 $PY "$@" > "/tmp/artifact_${name}.log" 2>&1
  rc=$?
  tail -2 "/tmp/artifact_${name}.log"
  echo "=== $name rc=$rc ==="
}

# 1) EfficientDet-d0 end-to-end train->AP evidence (r04: diverged at
#    adam@0.01; the proof now defaults adam@1e-3)
run effdet object_detection_tracking_tpu.cli.quality_proof \
  --workdir /tmp/odt_qeffdet5 --detector efficientdet-d0 --min_ap 0.5 \
  --out_json "QUALITY_EFFDET_${TAG}.json"

# 2) detection quality on HARD scenes (4x scale spread, crowding,
#    overlap) — min_ap 0.8. The first r05 run measured 0.794 at 400
#    images / 4000 steps; data diversity is the binding constraint on
#    synthetic scenes, so double the train set and extend the schedule.
run quality object_detection_tracking_tpu.cli.quality_proof \
  --workdir /tmp/odt_q5hard --train_images 800 --steps 5000 --hard \
  --min_ap 0.8 --out_json "QUALITY_${TAG}.json"

# 3) tracking on HARD scenes: one video-domain detector feeds both
#    trackers; per-class MOTA floor raised to 0.6 (VERDICT r4 #2);
#    artifacts carry tuned AND reference-parity (unlinked, n_init=1)
#    scores
run track_ds object_detection_tracking_tpu.cli.track_quality_proof \
  --workdir /tmp/odt_tq5hard --steps 4000 --hard \
  --min_class_mota 0.6 --min_mota 0.6 \
  --out_json /tmp/odt_tq5hard/TQ_deep_sort.json
run track_tmot object_detection_tracking_tpu.cli.track_quality_proof \
  --workdir /tmp/odt_tq5hard --steps 4000 --hard --tracker tmot \
  --min_class_mota 0.6 --min_mota 0.6 \
  --out_json /tmp/odt_tq5hard/TQ_tmot.json
python - "$TAG" <<'EOF'
import json, sys
tag = sys.argv[1]
out = {}
try:
    for key, path in (("deep_sort", "/tmp/odt_tq5hard/TQ_deep_sort.json"),
                      ("tmot", "/tmp/odt_tq5hard/TQ_tmot.json")):
        out[key] = json.load(open(path))
except FileNotFoundError as e:
    print("SKIP assembly, missing:", e)
    sys.exit(0)
out["note"] = ("cli.track_quality_proof --hard: from-scratch video-domain "
               "R18-FPN shapes detector (4000 steps, hard scene stats) -> "
               "full det+track pipeline -> native CLEAR-MOT/IDF1 vs "
               "generator ground truth, gated per class at MOTA>=0.6. Each "
               "tracker block also records reference_parity (n_init=1, "
               "max_iou 0.5, nn_budget 5, no offline linking — the "
               "reference's own defaults) alongside the tuned config.")
json.dump(out, open(f"TRACK_QUALITY_{tag}.json", "w"), indent=1)
print("assembled", f"TRACK_QUALITY_{tag}.json",
      {k: (v["passed"] if isinstance(v, dict) else None)
       for k, v in out.items() if k != "note"})
EOF

# 4) mask quality (stills; the mask gt is box-local 28x28 — the hard
#    flag applies to scene statistics and is supported here too)
run mask object_detection_tracking_tpu.cli.quality_proof \
  --workdir /tmp/odt_qmask5 --add_mask --hard --min_ap 0.8 \
  --out_json "QUALITY_MASK_${TAG}.json"

echo "=== r05 artifact queue done ==="
for f in QUALITY_EFFDET_${TAG}.json QUALITY_${TAG}.json \
         TRACK_QUALITY_${TAG}.json QUALITY_MASK_${TAG}.json; do
  [ -f "$f" ] && echo "$f: $(head -c 200 "$f")"
done
