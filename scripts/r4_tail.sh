#!/bin/bash
# Round-4 tail: runs after the training queue (r4_queue2.sh) exits.
# Serial — single-tenant chip, 1-core host (CPU work throttles TPU
# dispatch, so nothing overlaps).
#   1. FEM artifact regen at every best checkpoint (incl. the r4 runs,
#      magnitude-weighted aggregate_mid everywhere)  [TPU]
#   2. bench.py on the idle host (VERDICT r3 #9)      [TPU]
#   3. MFU / precision experiment (VERDICT r3 #8)     [TPU]
#   4. inverse pure-f64 CPU probe (VERDICT r3 #4)     [CPU, chip idle]
#   5. full test suite                                 [CPU]
#   6. commit everything
set -u
cd /root/repo
Q=${1:-/tmp/r4_queue2.pid}
HARD_END=${2:?epoch seconds hard stop}
left () { echo $(( HARD_END - $(date +%s) )); }

# Wait for the queue to finish (or its pid to vanish).
while [ -f "$Q" ] && kill -0 "$(cat "$Q")" 2>/dev/null; do
  sleep 60
done
echo "=== tail starts ($(date -u), ${1:-}) ==="

if [ "$(left)" -gt 1500 ]; then
  echo "=== regen FEM artifacts ==="
  timeout 1800 python scripts/regen_artifacts.py
  echo "regen rc=$?"
  git add -A runs/ && git commit -q -m "r4 tail: FEM artifacts regenerated at best checkpoints (magnitude-weighted aggregate_mid)" || true
fi

if [ "$(left)" -gt 900 ]; then
  echo "=== idle-host bench ==="
  timeout 1500 python bench.py | tee /tmp/bench_r4_idle.json
  cp /tmp/bench_r4_idle.json docs/bench_r4_idle.json 2>/dev/null
  git add docs/bench_r4_idle.json 2>/dev/null && git commit -q -m "r4 tail: idle-host bench capture" || true
fi

if [ "$(left)" -gt 2100 ]; then
  echo "=== MFU / precision experiment ==="
  timeout 2400 python scripts/mfu_experiment.py
  echo "mfu rc=$?"
  git add -A runs/mfu && git commit -q -m "r4 tail: MFU component profile + MXU-pass precision arms" || true
fi

if [ "$(left)" -gt 900 ]; then
  M=$(python3 -c "print(max(10, min(60, ($(left)-1500)/60)))")
  echo "=== inverse pure-f64 CPU probe (minutes=$M) ==="
  timeout $(( $(left) - 1200 )) \
    python scripts/inverse_f64_cpu.py --out runs/inverse --minutes "$M"
  echo "inverse rc=$?"
  git add -A runs/inverse && git commit -q -m "r4 tail: inverse pure-f64 CPU probe" || true
fi

if [ "$(left)" -gt 600 ]; then
  echo "=== full test suite ==="
  timeout $(( $(left) - 120 )) python -m pytest tests/ -q 2>&1 | tail -3
fi

git add -A runs/ docs/ && git commit -q -m "r4 tail: final artifact snapshot" || true
echo "=== r4 tail done ($(date -u)) ==="
