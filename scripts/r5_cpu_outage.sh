#!/bin/bash
# CPU work for the chip-outage window (03:00 UTC Aug 20).  All tasks force
# the CPU backend, commit their own artifacts, and are safe to kill at any
# point — r5_chain4.sh kills this queue the moment the chip probe succeeds
# (1-core host: CPU contention throttles TPU dispatch 2-20x, CLAUDE.md).
# Ordered highest-evidence-first so a short outage still lands the top items.
set -u
cd /root/repo

stop_if_up () { [ -f /tmp/tpu_up ] && { echo "chip up; cpu queue exiting"; exit 0; }; }

# 1. Pin the f64 ground truth of the confined best (f32 reading 1.6648e-4).
stop_if_up
timeout 900 python scripts/measure_ckpt_f64.py \
  runs/wave_confined_fourier/hybrid_best.ckpt --case wave_confined --max-t 14 \
  --build-kwargs '{"fourier":64,"fourier_scale":1.0,"bc":"hard"}' \
  --metrics runs/wave_confined_fourier/hybrid_metrics.jsonl \
  --note outage_f64_cpu || true
git add -A runs/ && git commit -q -m "r5 outage: confined best f64 measure" || true

# 2. FEM errors at the improved confined best (VERDICT weak #5 hygiene).
# regen_artifacts does not force a backend; during the outage the default
# axon init hangs ~25 min, so pin CPU explicitly.
stop_if_up
timeout 1500 env JAX_PLATFORMS=cpu python scripts/regen_artifacts.py wave_confined_fourier || true
git add -A runs/ docs/ && git commit -q -m "r5 outage: confined FEM regen at 1.66e-4 best" || true

# 3. Inverse E-recovery continuation (VERDICT item 5 follow-through; CPU f64).
stop_if_up
timeout 2400 python scripts/inverse_accel.py --minutes 35 --accel-weight 1.0 || true
git add -A runs/ && git commit -q -m "r5 outage: inverse accel E-recovery block" || true

# 4. Full test suite (round-5 green evidence; CPU 8-device virtual mesh).
stop_if_up
timeout 2400 python -m pytest tests/ -q 2>&1 | tail -5 > docs/tests_r5.txt || true
git add -A docs/ && git commit -q -m "r5 outage: full test suite run" || true

# 5. Keep the inverse descending until the chip returns.
while true; do
  stop_if_up
  timeout 2400 python scripts/inverse_accel.py --minutes 35 --accel-weight 1.0 || true
  git add -A runs/ && git commit -q -m "r5 outage: inverse accel block" || true
  sleep 10
done
