#!/bin/bash
# Round-4 extension queue (session b, 08:50 UTC): chip came up instantly.
# Slot 1: confined hard+Fourier hybrid resume (closest bar; handoff item 2).
# Slot 2: plate analytic+Fourier continuation (handoff item 4) — launched
#         separately once the freeze-B A/B decides the config.
set -u
cd /root/repo
export PINN_COMPILE_DEADLINE=${PINN_COMPILE_DEADLINE:-1500}
SLOT_END=${1:?epoch seconds hard stop for slot 1}
left () { echo $(( SLOT_END - $(date +%s) )); }

( while true; do
    sleep 1200
    git add -A runs/ 2>/dev/null
    git diff --cached --quiet 2>/dev/null \
      || git commit -q -m "r4b queue2: periodic training checkpoint snapshot" \
      || true
  done
) & echo $! > /tmp/r4b_committer.pid
trap 'kill $(cat /tmp/r4b_committer.pid) 2>/dev/null' EXIT

while [ "$(left)" -gt 600 ]; do
  H=$(python3 -c "print(($(left)-180)/3600.0)")
  echo "=== r4b slot1: confined hard+fourier hybrid (H=$H, $(date -u)) ==="
  timeout $(( $(left) - 60 )) \
    python scripts/hybrid_endgame.py runs/wave_confined_fourier/hybrid_best.ckpt \
      runs/wave_confined_fourier/hybrid_best.ckpt --case wave_confined \
      --max-t 14 \
      --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}' \
      --hours "$H" --target 3.8e-5 --f32-segment 8 --f32-block 150 --host-block 250 \
      --metrics runs/wave_confined_fourier/hybrid_metrics.jsonl
  rc=$?; echo "slot1 rc=$rc"
  git add -A runs/wave_confined_fourier && git commit -q -m "r4b: confined hard+Fourier hybrid checkpoint" || true
  [ $rc -eq 0 ] && break
  sleep 5
done
echo "=== r4b slot1 done ($(date -u)) ==="
