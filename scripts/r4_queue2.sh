#!/bin/bash
# Round-4 TPU queue, take 2.  Supersedes r4_queue.sh after two first-hour
# findings:
#   * slot A (plate analytic+Fourier from scratch) patience-stopped at loss
#     0.373 after 1887 iters — the f32 L-BFGS wedge pathology, NOT a time
#     limit.  The tool for wedged cases is the hybrid engine (f32 sprints +
#     host-f64 drills, scripts/hybrid_endgame.py) — it now CLOSES the queue
#     with all leftover time instead of a fixed early slot.
#   * take 1 gave slot C everything to TRAIN_END, leaving the plate zero
#     recovery time.  Budgets are now B 33% / C 33% / plate-hybrid rest.
# Inherits take 1's hardenings: 20-min background committer (VM restarts
# restore the tree to the last commit), PINN_COMPILE_DEADLINE watchdog,
# strictly serial single-tenant chip.
set -u
cd /root/repo

export PINN_COMPILE_DEADLINE=${PINN_COMPILE_DEADLINE:-1500}
TRAIN_END=${1:?epoch seconds when training slots must stop}
left () { echo $(( TRAIN_END - $(date +%s) )); }

( while true; do
    sleep 1200
    git add -A runs/ 2>/dev/null
    git diff --cached --quiet 2>/dev/null \
      || git commit -q -m "r4 queue: periodic training checkpoint snapshot" \
      || true
  done
) & echo $! > /tmp/r4_committer.pid
trap 'kill $(cat /tmp/r4_committer.pid) 2>/dev/null' EXIT

while [ "$(left)" -gt 900 ]; do
  echo "=== probe backend init ($(left)s to train-end, $(date -u)) ==="
  timeout 1800 python -c "import jax; print(jax.devices())" && break
  echo "probe failed rc=$?"; sleep 30
done
[ "$(left)" -le 900 ] && { echo "chip never came back"; exit 1; }
echo "=== CHIP UP at $(date -u), window $(left)s ==="
W=$(left)

# ---- Slot B: semi hard+Fourier curriculum (33%) ---------------------------
B_END=$(( $(date +%s) + W * 33 / 100 ))
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

# ---- Slot C: confined hard+Fourier curriculum (33%) -----------------------
C_END=$(( $(date +%s) + W * 33 / 100 ))
[ "$C_END" -gt "$TRAIN_END" ] && C_END=$TRAIN_END
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

# ---- Closer: plate analytic hybrid endgame (all remaining time) -----------
# From the slot-A best (loss 0.373, f32-wedged): f32 sprints while descent
# certifies, host-f64 drills through the floors (r3's confined playbook).
while [ "$(left)" -gt 1200 ]; do
  H=$(python3 -c "print(($(left)-600)/3600.0)")
  echo "=== closer: plate analytic hybrid endgame (H=$H, $(date -u)) ==="
  timeout $(( $(left) - 300 )) \
    python scripts/hybrid_endgame.py runs/plate_analytic/best.ckpt \
      runs/plate_analytic/hybrid_best.ckpt --case plate_hole \
      --build-kwargs '{"fourier": 64, "fourier_scale": 2.0, "bc": "analytic"}' \
      --hours "$H" --target 7.08e-4 \
      --metrics runs/plate_analytic/hybrid_metrics.jsonl
  echo "closer rc=$?"
  git add -A runs/plate_analytic && git commit -q -m "r4 closer: plate analytic hybrid endgame checkpoint" || true
  sleep 15
done

echo "=== r4 queue2 done ($(date -u)) ==="
