#!/bin/bash
# Round-4 closer, take 2: confined hard+Fourier owns the final training block.
#
# Rationale (04:17 UTC): slot C's hybrid took the from-scratch confined
# hard+Fourier arm 1.10e-2 -> 4.64e-4 in ~13 min of storm-safe sprinting with
# no wedge — the structural lever actually working at full scale, and the
# closest accuracy bar on the board (soft-arm best 1.755e-4; r2 goal 1.5e-4;
# true bar 3.8e-5).  The plate closer from 0.373 could not reach
# FEM-competitive territory in the same 75 min, so the plate keeps its
# committed slot-A artifacts and the confined continuation gets the window.
set -u
cd /root/repo
export PINN_COMPILE_DEADLINE=${PINN_COMPILE_DEADLINE:-1500}
CL_END=${1:?epoch seconds hard stop for the closer}
left () { echo $(( CL_END - $(date +%s) )); }

( while true; do
    sleep 1200
    git add -A runs/ 2>/dev/null
    git diff --cached --quiet 2>/dev/null \
      || git commit -q -m "r4 closer: periodic training checkpoint snapshot" \
      || true
  done
) & echo $! > /tmp/r4_closer_committer.pid
trap 'kill $(cat /tmp/r4_closer_committer.pid) 2>/dev/null' EXIT

while [ "$(left)" -gt 600 ]; do
  H=$(python3 -c "print(($(left)-180)/3600.0)")
  echo "=== closer: confined hard+fourier hybrid (H=$H, $(date -u)) ==="
  timeout $(( $(left) - 60 )) \
    python scripts/hybrid_endgame.py runs/wave_confined_fourier/hybrid_best.ckpt \
      runs/wave_confined_fourier/hybrid_best.ckpt --case wave_confined \
      --max-t 14 \
      --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}' \
      --hours "$H" --target 3.8e-5 --f32-segment 8 \
      --metrics runs/wave_confined_fourier/hybrid_metrics.jsonl
  rc=$?; echo "closer rc=$rc"
  git add -A runs/wave_confined_fourier && git commit -q -m "r4 closer: confined hard+Fourier hybrid checkpoint" || true
  [ $rc -eq 0 ] && break
  sleep 10
done
echo "=== r4 closer done ($(date -u)) ==="
