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
# Budgets rebalanced 04:15 UTC: the realized tail window is ~4200s while the
# original budgets summed to 13200s — the last five steps would all drop
# (the exact r4 failure mode this queue was reordered to prevent).  steprate
# is a ~6-min job (its own header) and mfu's arms are deadline-aware, so the
# trimmed budgets keep all four TPU measurements inside the window.  The CPU
# items move to the post-chain window (scripts/r5_final.sh + agent session):
# fem_regen for the two active cases already runs inside r5_closer.sh.
step mfu_experiment 1500 python scripts/mfu_experiment.py
step steprate_bisect 900 bash scripts/steprate_bisect.sh
step ablation_rerun 1200 python scripts/ablation.py --out runs/ablation_semi --minutes 3
step idle_bench 600 bash -c 'python bench.py --skip-stt > docs/bench_r5_idle.json.tmp && mv docs/bench_r5_idle.json.tmp docs/bench_r5_idle.json && cat docs/bench_r5_idle.json'

echo "=== r5 tail done ($(date -u)) ==="
