#!/bin/bash
# Alternating Adam-escape / L-BFGS-polish cycles (see scripts/adam_escape.py).
set -u
CK=${1:-runs/plate_v2/adam_escape.ckpt}
N=${2:-4}
for i in $(seq 1 "$N"); do
  echo "=== cycle $i from $CK ==="
  python -u scripts/adam_escape.py "$CK" "$CK" || sleep 120
done
