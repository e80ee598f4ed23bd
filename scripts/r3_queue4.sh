#!/bin/bash
# Round-3 TPU queue, take 4 (amended: semi slot trains bc=hard).  Changes vs take 3:
#   * plate slot runs the ANALYTIC hard-BC composite (bc=analytic): exact
#     closed-form D/P + Fourier uv — CPU A/B at equal budget: loss 3.84 vs
#     8.45 for the net-BC composite with the f64 pretrain (2.2x lower)
#   * inverse host-f64 retried (take-3 attempt died in backend init during
#     the 21:36-23:3x+ chip outage)
# Strictly serial — the chip is single-tenant (CLAUDE.md).  No persistent
# compile cache (hangs the axon plugin, see r3_queue3.sh note).
set -u
cd /root/repo

TPU_DEADLINE=${1:-$(( $(date +%s) + 21600 ))}   # default 6h
left () { echo $(( TPU_DEADLINE - $(date +%s) )); }

# plate analytic+fourier: 50% of the window, relaunch loop (crash-resume
# from best.ckpt with curvature carry).
PLATE_END=$(( $(date +%s) + $(left) * 50 / 100 ))
while [ "$(date +%s)" -lt "$(( PLATE_END - 300 ))" ]; do
  M=$(python3 -c "import time; print(max(5, min(150, ($PLATE_END-time.time())/60-2)))")
  echo "=== plate analytic+fourier ($(left)s to deadline, minutes=$M) ==="
  timeout $(( PLATE_END - $(date +%s) + 300 )) \
    python scripts/plate_fourier.py --out runs/plate_analytic \
      --bc analytic --minutes "$M" --block 1000
  rc=$?
  echo "plate_analytic rc=$rc"
  [ $rc -eq 0 ] && break
  sleep 10
done
while [ "$(date +%s)" -lt "$(( PLATE_END - 600 ))" ]; do
  H=$(python3 -c "import time; print(($PLATE_END-time.time())/3600.0)")
  echo "=== plate analytic hybrid endgame (H=$H) ==="
  timeout $(( PLATE_END - $(date +%s) + 300 )) \
    python scripts/hybrid_endgame.py runs/plate_analytic/best.ckpt \
      runs/plate_analytic/hybrid_best.ckpt --case plate_hole \
      --build-kwargs '{"fourier": 64, "fourier_scale": 2.0, "bc": "analytic"}' \
      --hours "$H" --target 7.08e-4 \
      --metrics runs/plate_analytic/hybrid_metrics.jsonl
  echo "plate hybrid rc=$?"
  sleep 10
done

if [ "$(left)" -gt 1800 ]; then
  echo "=== inverse host-f64 endgame ($(left)s left) ==="
  timeout 5400 python scripts/inverse_host.py --out runs/inverse --hours 1.0
  echo "inverse_host rc=$?"
fi

# semi Fourier from scratch: 8s -> 16s curriculum (ablation's winning
# embedding).  Curriculum live-checkpoints; timeout kills are cheap.
SEMI_END=$(( $(date +%s) + ( $(left) * 75 / 100 ) ))
[ "$SEMI_END" -gt "$TPU_DEADLINE" ] && SEMI_END=$TPU_DEADLINE
while [ "$(date +%s)" -lt "$(( SEMI_END - 600 ))" ]; do
  echo "=== semi fourier curriculum ($(left)s to deadline) ==="
  timeout $(( SEMI_END - $(date +%s) + 60 )) \
    python scripts/train_wave.py --case wave_semi_infinite \
      --out runs/wave_semi_fourier --fourier 64 --fourier-scale 1.0 \
      --bc hard --stages 8:12000 16:15000 --adam 3000 --log-every 250
  rc=$?
  echo "semi_fourier rc=$rc"
  [ $rc -eq 0 ] && break
  sleep 10
done

# Leftover: FEM regen at endgame checkpoints, then confined host filler.
if [ "$(left)" -gt 1200 ]; then
  echo "=== regen FEM artifacts ($(left)s left) ==="
  timeout 2700 python scripts/regen_artifacts.py
  echo "regen rc=$?"
fi
while [ "$(left)" -gt 900 ]; do
  H=$(python3 -c "print(($(left)-600)/3600.0)")
  echo "=== confined host endgame filler ($(left)s left) ==="
  timeout $(( $(left) - 300 )) \
    python scripts/host_endgame.py runs/wave_confined/host_best.ckpt \
      runs/wave_confined/host_best.ckpt \
      --case wave_confined --max-t 14 --hours "$H" --target 1.5e-4 \
      --metrics runs/wave_confined/endgame_metrics.jsonl
  echo "confined rc=$?"
  sleep 15
done

echo "=== r3 queue4 done ($(date -u)) ==="
