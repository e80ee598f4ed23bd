#!/bin/bash
# Round-3 TPU queue, take 5.  Supersedes r3_queue4.sh, whose fixed time
# allocation was computed at launch and has been consumed by the chip/tunnel
# outage (backend init UNAVAILABLE since ~21:36, every attempt hangs ~25 min
# then fails).  Changes:
#   * Phase 0 probes backend init in a loop and only STARTS the clock when
#     the chip is actually back, so the training window is divided over real
#     chip time, not outage time.
#   * confined gets a hard+Fourier from-scratch curriculum slot: the CPU
#     evidence run (/tmp/deep_confined.py, scale 0.1) descends 4.5e-3 ->
#     3.8e-4 in 1.5k iters — same structural lever as semi.
#   * kills the CPU evidence job on chip-up (1-core host: CPU contention
#     throttles TPU dispatch 2-20x, CLAUDE.md).
# Strictly serial — the chip is single-tenant.
set -u
cd /root/repo

TPU_DEADLINE=${1:-$(( $(date +%s) + 28800 ))}   # default 8h
left () { echo $(( TPU_DEADLINE - $(date +%s) )); }

# ---- Phase 0: wait for the chip ------------------------------------------
while [ "$(left)" -gt 900 ]; do
  echo "=== probe backend init ($(left)s to deadline, $(date -u)) ==="
  timeout 1800 python -c "import jax; print(jax.devices())" && break
  echo "probe failed rc=$?"
  sleep 30
done
if [ "$(left)" -le 900 ]; then
  echo "=== chip never came back; queue5 exiting ($(date -u)) ==="
  exit 1
fi
echo "=== CHIP UP at $(date -u), window $(left)s ==="
# Free the single core for TPU dispatch.
if [ -f /tmp/deep_confined.pid ]; then
  kill "$(cat /tmp/deep_confined.pid)" 2>/dev/null && echo "killed CPU evidence job"
fi

W=$(left)

# ---- Slot 1: plate analytic+Fourier from scratch (38% of window) ---------
PLATE_END=$(( $(date +%s) + W * 38 / 100 ))
while [ "$(date +%s)" -lt "$(( PLATE_END - 300 ))" ]; do
  M=$(python3 -c "import time; print(max(5, min(150, ($PLATE_END-time.time())/60-2)))")
  echo "=== plate analytic+fourier (minutes=$M, $(left)s to deadline) ==="
  timeout $(( PLATE_END - $(date +%s) + 300 )) \
    python scripts/plate_fourier.py --out runs/plate_analytic \
      --bc analytic --minutes "$M" --block 1000
  rc=$?
  echo "plate_analytic rc=$rc"
  [ $rc -eq 0 ] && break
  sleep 10
done

# ---- Slot 2: FEM regen at r3 endgame checkpoints (cheap, high evidence) --
if [ "$(left)" -gt 1800 ]; then
  echo "=== regen FEM artifacts ($(left)s left) ==="
  timeout 2400 python scripts/regen_artifacts.py
  echo "regen rc=$?"
fi

# ---- Slot 3: semi hard+Fourier curriculum from scratch -------------------
SEMI_END=$(( $(date +%s) + W * 27 / 100 ))
[ "$SEMI_END" -gt "$TPU_DEADLINE" ] && SEMI_END=$TPU_DEADLINE
while [ "$(date +%s)" -lt "$(( SEMI_END - 600 ))" ]; do
  echo "=== semi hard+fourier curriculum ($(left)s to deadline) ==="
  timeout $(( SEMI_END - $(date +%s) + 60 )) \
    python scripts/train_wave.py --case wave_semi_infinite \
      --out runs/wave_semi_fourier --fourier 64 --fourier-scale 1.0 \
      --bc hard --stages 8:12000 16:15000 --adam 3000 --log-every 250 \
      --target 2.7e-5
  rc=$?
  echo "semi_fourier rc=$rc"
  [ $rc -eq 0 ] && break
  sleep 10
done

# ---- Slot 4: confined hard+Fourier curriculum from scratch ---------------
CONF_END=$(( $(date +%s) + W * 21 / 100 ))
[ "$CONF_END" -gt "$TPU_DEADLINE" ] && CONF_END=$TPU_DEADLINE
while [ "$(date +%s)" -lt "$(( CONF_END - 600 ))" ]; do
  echo "=== confined hard+fourier curriculum ($(left)s to deadline) ==="
  timeout $(( CONF_END - $(date +%s) + 60 )) \
    python scripts/train_wave.py --case wave_confined \
      --out runs/wave_confined_fourier --fourier 64 --fourier-scale 1.0 \
      --bc hard --stages 7:12000 14:15000 --adam 3000 --log-every 250 \
      --target 3.8e-5
  rc=$?
  echo "confined_fourier rc=$rc"
  [ $rc -eq 0 ] && break
  sleep 10
done

# ---- Slot 5: inverse host-f64 endgame (rho bias, VERDICT #7) -------------
if [ "$(left)" -gt 2400 ]; then
  H=$(python3 -c "print(min(1.0, ($(left)-900)/3600.0))")
  echo "=== inverse host-f64 endgame (H=$H, $(left)s left) ==="
  timeout $(( $(left) - 600 )) python scripts/inverse_host.py \
    --out runs/inverse --hours "$H"
  echo "inverse_host rc=$?"
fi

# ---- Filler: plate hybrid endgame from the analytic best -----------------
while [ "$(left)" -gt 1200 ]; do
  H=$(python3 -c "print(($(left)-600)/3600.0)")
  echo "=== plate analytic hybrid endgame (H=$H) ==="
  timeout $(( $(left) - 300 )) \
    python scripts/hybrid_endgame.py runs/plate_analytic/best.ckpt \
      runs/plate_analytic/hybrid_best.ckpt --case plate_hole \
      --build-kwargs '{"fourier": 64, "fourier_scale": 2.0, "bc": "analytic"}' \
      --hours "$H" --target 7.08e-4 \
      --metrics runs/plate_analytic/hybrid_metrics.jsonl
  echo "plate hybrid rc=$?"
  sleep 15
done

echo "=== r3 queue5 done ($(date -u)) ==="
