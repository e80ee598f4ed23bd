#!/bin/bash
# Round-3 TPU queue, take 3: the post-scaling-fix endgame schedule.
#   0. compile-cache probe (persistent cache would de-risk every relaunch:
#      identical graphs measured 68 s vs 31+ min on the axon remote compiler)
#   1. regen stale FEM reports at the endgame best checkpoints
#   2. inverse host-f64 endgame (rho 4.6% is resolution-floored in f32)
#   3. plate_fourier resume (structural fix for the 0.029 f32 floor)
#   4. semi Fourier from-scratch curriculum (its -78% gap is basin-limited)
#   5. leftover: confined host-f64 endgame continuation
# Strictly serial — the chip is single-tenant (CLAUDE.md).
set -u
cd /root/repo
# NOTE: persistent-compilation-cache env vars deliberately NOT set — the
# first probe (scripts/compile_cache_probe.py) hung past its 900 s timeout
# with the cache configured and created no cache dir, so the cache either
# doesn't work through the axon PJRT plugin or poisons its compile path.
# Measured 2026-08-17 21:36; don't re-enable without a fresh probe.

TPU_DEADLINE=${1:-$(( $(date +%s) + 23400 ))}   # default 6.5h
left () { echo $(( TPU_DEADLINE - $(date +%s) )); }

if [ "$(left)" -gt 1200 ]; then
  echo "=== regen FEM artifacts ($(left)s left) ==="
  timeout 2700 python scripts/regen_artifacts.py
  echo "regen rc=$?"
fi

if [ "$(left)" -gt 1800 ]; then
  echo "=== inverse host-f64 endgame ($(left)s left) ==="
  timeout 5400 python scripts/inverse_host.py --out runs/inverse --hours 1.0
  echo "inverse_host rc=$?"
fi

# plate_fourier: 45% of what's left.  First the sprint script (crash-resume
# from best.ckpt with curvature carry); once it patience-stops (f32 floor),
# hand the remainder to the hybrid engine (f32 sprints + host-f64 drills)
# over the SAME checkpoint — that is the engineered tool for floors.
PLATE_END=$(( $(date +%s) + $(left) * 45 / 100 ))
while [ "$(date +%s)" -lt "$(( PLATE_END - 300 ))" ]; do
  M=$(python3 -c "import time; print(max(5, min(150, ($PLATE_END-time.time())/60-2)))")
  echo "=== plate_fourier ($(left)s to deadline, minutes=$M) ==="
  timeout $(( PLATE_END - $(date +%s) + 300 )) \
    python scripts/plate_fourier.py --out runs/plate_fourier --minutes "$M" \
      --block 1000
  rc=$?
  echo "plate_fourier rc=$rc"
  [ $rc -eq 0 ] && break   # clean exit = patience stop or budget done
  sleep 10
done
while [ "$(date +%s)" -lt "$(( PLATE_END - 600 ))" ]; do
  H=$(python3 -c "import time; print(($PLATE_END-time.time())/3600.0)")
  echo "=== plate_fourier hybrid endgame (H=$H) ==="
  timeout $(( PLATE_END - $(date +%s) + 300 )) \
    python scripts/hybrid_endgame.py runs/plate_fourier/best.ckpt \
      runs/plate_fourier/hybrid_best.ckpt --case plate_hole \
      --build-kwargs '{"fourier": 64, "fourier_scale": 2.0}' \
      --hours "$H" --target 7.08e-4 \
      --metrics runs/plate_fourier/hybrid_metrics.jsonl
  echo "plate hybrid rc=$?"
  sleep 10
done

# semi Fourier from scratch: 8s -> 16s curriculum, ablation's winning
# embedding (64 features, scale 1.0, normalized inputs).  The curriculum
# driver checkpoints mid-stage and resumes, so timeout kills are cheap;
# the persistent cache (if live) makes the relaunch recompiles cheap too.
SEMI_END=$(( $(date +%s) + ( $(left) * 80 / 100 ) ))
[ "$SEMI_END" -gt "$TPU_DEADLINE" ] && SEMI_END=$TPU_DEADLINE
while [ "$(date +%s)" -lt "$(( SEMI_END - 600 ))" ]; do
  echo "=== semi fourier curriculum ($(left)s to deadline) ==="
  timeout $(( SEMI_END - $(date +%s) + 60 )) \
    python scripts/train_wave.py --case wave_semi_infinite \
      --out runs/wave_semi_fourier --fourier 64 --fourier-scale 1.0 \
      --stages 8:12000 16:15000 --adam 3000 --log-every 250
  rc=$?
  echo "semi_fourier rc=$rc"
  [ $rc -eq 0 ] && break
  sleep 10
done

# Leftover: confined host endgame (power-law-slow; strictly a filler).
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

echo "=== r3 queue3 done ($(date -u)) ==="
