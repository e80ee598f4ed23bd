#!/bin/bash
# r4b tail (strictly serial; 1-core VM — CPU work starves TPU dispatch):
#   1. idle-host bench capture           (TPU)
#   2. HIGH matmul-precision probes      (TPU; vg throughput + descent guard)
#   3. FEM artifact regen at best ckpts  (TPU)
#   4. inverse acceleration-supervision probe (CPU f64)
#   5. full test suite                   (CPU)
set -u
cd /root/repo
TAIL_END=${1:?epoch seconds hard stop}
left () { echo $(( TAIL_END - $(date +%s) )); }

echo "=== tail 1: idle bench ($(date -u)) ==="
timeout 1500 python bench.py > /tmp/bench_r4b.json 2>/tmp/bench_r4b.err
if [ -s /tmp/bench_r4b.json ]; then
  cp /tmp/bench_r4b.json docs/bench_r4b_idle.json
  git add docs/bench_r4b_idle.json && git commit -q -m "r4b tail: idle-host bench capture" || true
fi
cat /tmp/bench_r4b.json || tail -3 /tmp/bench_r4b.err

if [ "$(left)" -gt 4200 ]; then
  echo "=== tail 2: HIGH-precision probes ($(date -u)) ==="
  PINN_KERNEL_PRECISION=highest timeout 900 python scripts/mfu_experiment.py --arm vg_flagship
  PINN_KERNEL_PRECISION=high    timeout 900 python scripts/mfu_experiment.py --arm vg_flagship
  CK=runs/plate_analytic/hybrid_best.ckpt
  [ -f "$CK" ] || CK=runs/plate_analytic/best.ckpt
  PINN_KERNEL_PRECISION=high timeout 1200 python scripts/mfu_experiment.py \
    --arm descent --ckpt "$CK" --iters 200
  git add -A runs/mfu && git commit -q -m "r4b tail: HIGH matmul-precision vg + descent probes" || true
fi

echo "=== tail 3: FEM artifact regen ($(date -u)) ==="
timeout 1800 python scripts/regen_artifacts.py
git add -A runs/ && git commit -q -m "r4b tail: FEM artifacts regenerated at best checkpoints" || true

M=$(( ($(left) - 1500) / 60 ))
if [ "$M" -gt 10 ]; then
  [ "$M" -gt 45 ] && M=45
  echo "=== tail 4: inverse accel probe (${M} min, $(date -u)) ==="
  timeout $(( M * 60 + 240 )) python scripts/inverse_accel.py --minutes "$M"
  git add -A runs/inverse && git commit -q -m "r4b tail: inverse acceleration-supervision probe" || true
fi

echo "=== tail 5: test suite ($(date -u)) ==="
timeout 1400 python -m pytest tests/ -q 2>&1 | tail -3 | tee /tmp/r4b_tests.txt
git add -A runs/ && git commit -q -m "r4b tail: final artifact snapshot" || true
echo "=== r4b tail done ($(date -u)) ==="
