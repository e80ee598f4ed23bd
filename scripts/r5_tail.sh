#!/bin/bash
# r5 tail: measurement + artifact-hygiene queue, highest-value-first
# (r4 lesson: tail slots kept losing their last items — MFU and the FEM
# regen dropped two rounds running).  TPU tasks run first while the chip is
# healthy; CPU tasks close (they survive a chip outage).
#
#   bash scripts/r5_tail.sh TAIL_END_EPOCH
set -u
cd /root/repo
TAIL_END=${1:?epoch seconds hard stop}
left () { echo $(( TAIL_END - $(date +%s) )); }

( while true; do
    sleep 1200
    git add -A runs/ docs/ 2>/dev/null
    git diff --cached --quiet 2>/dev/null \
      || git commit -q -m "r5 tail: periodic artifact snapshot" || true
  done
) & echo $! > /tmp/r5tail_committer.pid
trap 'kill $(cat /tmp/r5tail_committer.pid) 2>/dev/null' EXIT

step () {  # name, budget_s, cmd...
  local name=$1 budget=$2; shift 2
  [ "$(left)" -gt 300 ] || { echo "tail out of time before $name"; return; }
  [ "$budget" -gt "$(left)" ] && budget=$(( $(left) - 120 ))
  echo "=== r5 tail: $name (budget ${budget}s, $(date -u)) ==="
  # Deadline visible to deadline-aware steps (mfu_experiment stops
  # launching TPU sub-arms that cannot finish).
  STEP_DEADLINE_EPOCH=$(( $(date +%s) + budget )) timeout "$budget" "$@"
  echo "$name rc=$?"
  git add -A runs/ docs/ && git commit -q -m "r5 tail: $name" || true
}

# --- TPU tasks (serial, single-tenant chip) ---
step mfu_experiment 1800 python scripts/mfu_experiment.py
step steprate_bisect 2100 bash scripts/steprate_bisect.sh
step idle_bench 1500 bash -c 'python bench.py > docs/bench_r5_idle.json.tmp && mv docs/bench_r5_idle.json.tmp docs/bench_r5_idle.json && cat docs/bench_r5_idle.json'
step ablation_rerun 2100 python scripts/ablation.py --out runs/ablation_semi --minutes 4

# --- CPU tasks ---
step fem_regen 1500 python scripts/regen_artifacts.py
step inverse_e_recovery 2400 python scripts/inverse_accel.py --minutes 35 --accel-weight 1.0
step tests 1800 python -m pytest tests/ -q

echo "=== r5 tail done ($(date -u)) ==="
