#!/bin/bash
# L-BFGS-with-restarts driver: each round warm-starts from the newest
# checkpoint; restarting resets curvature history, which often breaks
# f32 plateaus the in-run patience test stops at.
set -u
OUT=${1:-runs/plate_v2}
ROUNDS=${2:-20}
ITERS=${3:-2000}
CK="$OUT/plate_hole_quarter_uv.ckpt"
[ -f "$OUT/plate_hole_quarter_live.ckpt" ] && CK="$OUT/plate_hole_quarter_live.ckpt"
for i in $(seq 1 "$ROUNDS"); do
  echo "=== restart round $i from $CK ==="
  python -m pinn_elastodynamics_tpu.run --case plate_hole --scale 1.0 \
    --out "$OUT" --warm-start "$CK" \
    --maxiter dist=0 part=0 uv="$ITERS" --segment 25 --log-every 500 \
    || sleep 120   # device hiccup: wait and retry next round
  CK="$OUT/plate_hole_quarter_uv.ckpt"
done
