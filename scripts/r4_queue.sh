#!/bin/bash
# Round-4 TPU queue.  Lessons encoded:
#   * 2026-08-18 13:55: the VM restarted mid-round and the working tree was
#     restored to the last COMMIT — the 4h slot-A run launched at 09:15 left
#     no trace.  A background committer snapshots runs/ every 20 min so a
#     restart costs <=20 min of training, not the whole slot.
#   * PINN_COMPILE_DEADLINE hard-exits a hung axon remote compile (r3: 68s
#     vs >31min for identical graphs); the per-slot relaunch loop retries
#     and the scripts resume from checkpoint.
#   * Strictly serial — the chip is single-tenant; the host is 1-core, so
#     nothing CPU-heavy runs alongside (CLAUDE.md: 2-20x dispatch throttle).
# Slots follow VERDICT r3 "next round" #1/#2/#10: the structural-lever
# (analytic/hard BC + Fourier) from-scratch runs at full scale.
set -u
cd /root/repo

export PINN_COMPILE_DEADLINE=${PINN_COMPILE_DEADLINE:-1500}
TRAIN_END=${1:?epoch seconds when training slots must stop}
left () { echo $(( TRAIN_END - $(date +%s) )); }

# ---- background committer: snapshot training state every 20 min ----------
(
  while true; do
    sleep 1200
    git add -A runs/ 2>/dev/null
    if ! git diff --cached --quiet 2>/dev/null; then
      git commit -q -m "r4 queue: periodic training checkpoint snapshot" \
        || true
    fi
  done
) & echo $! > /tmp/r4_committer.pid
trap 'kill $(cat /tmp/r4_committer.pid) 2>/dev/null' EXIT

# ---- Phase 0: probe until the chip is up ----------------------------------
while [ "$(left)" -gt 900 ]; do
  echo "=== probe backend init ($(left)s to train-end, $(date -u)) ==="
  timeout 1800 python -c "import jax; print(jax.devices())" && break
  echo "probe failed rc=$?"; sleep 30
done
[ "$(left)" -le 900 ] && { echo "chip never came back"; exit 1; }
echo "=== CHIP UP at $(date -u), window $(left)s ==="
W=$(left)

# ---- Slot A: plate analytic+Fourier from scratch (40%) --------------------
A_END=$(( $(date +%s) + W * 40 / 100 ))
while [ "$(date +%s)" -lt "$(( A_END - 300 ))" ]; do
  M=$(python3 -c "import time; print(max(5, min(150, ($A_END-time.time())/60-2)))")
  echo "=== slot A: plate analytic+fourier (minutes=$M, $(date -u)) ==="
  timeout $(( A_END - $(date +%s) + 300 )) \
    python scripts/plate_fourier.py --out runs/plate_analytic \
      --bc analytic --minutes "$M" --block 1000
  rc=$?; echo "slot A rc=$rc"
  [ $rc -eq 0 ] && break
  sleep 10
done
git add -A runs/plate_analytic && git commit -q -m "r4 slot A: plate analytic+Fourier from-scratch checkpoint" || true

# ---- Slot B: semi hard+Fourier curriculum (32%) ---------------------------
B_END=$(( $(date +%s) + W * 32 / 100 ))
[ "$B_END" -gt "$TRAIN_END" ] && B_END=$TRAIN_END
while [ "$(date +%s)" -lt "$(( B_END - 600 ))" ]; do
  echo "=== slot B: semi hard+fourier curriculum ($(date -u)) ==="
  timeout $(( B_END - $(date +%s) + 60 )) \
    python scripts/train_wave.py --case wave_semi_infinite \
      --out runs/wave_semi_fourier --fourier 64 --fourier-scale 1.0 \
      --bc hard --stages 8:12000 16:15000 --adam 3000 --log-every 250 \
      --target 2.7e-5
  rc=$?; echo "slot B rc=$rc"
  [ $rc -eq 0 ] && break
  sleep 10
done
git add -A runs/wave_semi_fourier && git commit -q -m "r4 slot B: semi hard+Fourier curriculum checkpoint" || true

# ---- Slot C: confined hard+Fourier curriculum (rest) ----------------------
C_END=$TRAIN_END
while [ "$(date +%s)" -lt "$(( C_END - 600 ))" ]; do
  echo "=== slot C: confined hard+fourier curriculum ($(date -u)) ==="
  timeout $(( C_END - $(date +%s) + 60 )) \
    python scripts/train_wave.py --case wave_confined \
      --out runs/wave_confined_fourier --fourier 64 --fourier-scale 1.0 \
      --bc hard --stages 7:12000 14:15000 --adam 3000 --log-every 250 \
      --target 3.8e-5
  rc=$?; echo "slot C rc=$rc"
  [ $rc -eq 0 ] && break
  sleep 10
done
git add -A runs/wave_confined_fourier && git commit -q -m "r4 slot C: confined hard+Fourier curriculum checkpoint" || true

echo "=== r4 queue training slots done ($(date -u)) ==="
