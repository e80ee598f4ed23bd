#!/bin/bash
# Round-4 tail, take 2.  Reorders take 1 by VERDICT r3 priority: the inverse
# pure-f64 CPU probe (#4, missed two rounds running) now precedes the MFU
# experiment (#8), and budgets are explicit caps instead of leftovers.
# Serial — single-tenant chip, 1-core host.
set -u
cd /root/repo
Q=${1:-/tmp/r4_queue3.pid}
HARD_END=${2:?epoch seconds hard stop}
left () { echo $(( HARD_END - $(date +%s) )); }

while [ -f "$Q" ] && kill -0 "$(cat "$Q")" 2>/dev/null; do
  sleep 60
done
echo "=== tail2 starts ($(date -u)) ==="
export PINN_COMPILE_DEADLINE=${PINN_COMPILE_DEADLINE:-900}

if [ "$(left)" -gt 1200 ]; then
  echo "=== regen FEM artifacts ==="
  timeout 1500 python scripts/regen_artifacts.py
  echo "regen rc=$?"
  git add -A runs/ && git commit -q -m "r4 tail: FEM artifacts regenerated at best checkpoints" || true
fi

if [ "$(left)" -gt 900 ]; then
  echo "=== idle-host bench ==="
  timeout 1200 python bench.py | tee /tmp/bench_r4_idle.json
  cp /tmp/bench_r4_idle.json docs/bench_r4_idle.json 2>/dev/null
  git add docs/bench_r4_idle.json 2>/dev/null && git commit -q -m "r4 tail: idle-host bench capture" || true
fi

if [ "$(left)" -gt 1200 ]; then
  M=$(python3 -c "print(max(10, min(45, ($(left)-900)//60)))")
  echo "=== inverse pure-f64 CPU probe (minutes=$M) ==="
  timeout $(( $(left) - 600 )) \
    python scripts/inverse_f64_cpu.py --out runs/inverse --minutes "$M"
  echo "inverse rc=$?"
  git add -A runs/inverse && git commit -q -m "r4 tail: inverse pure-f64 CPU probe" || true
fi

if [ "$(left)" -gt 1800 ]; then
  echo "=== MFU / precision experiment ==="
  timeout $(( $(left) - 900 )) python scripts/mfu_experiment.py
  echo "mfu rc=$?"
  git add -A runs/mfu && git commit -q -m "r4 tail: MFU component profile + MXU-pass precision arms" || true
fi

if [ "$(left)" -gt 600 ]; then
  echo "=== full test suite ==="
  timeout $(( $(left) - 120 )) python -m pytest tests/ -q 2>&1 | tail -3
fi

git add -A runs/ docs/ && git commit -q -m "r4 tail: final artifact snapshot" || true
echo "=== r4 tail2 done ($(date -u)) ==="
