#!/bin/bash
# Step-rate regression bisect (VERDICT r4 weak #3): r2 captured 0.0812 s for
# the full-loss value+grad step; the r4 IDLE capture reads 0.0967 s — a ~19%
# regression nobody root-caused.  Decisive experiment: run the r2-era bench
# code (commit 92e6167, its own kernels) and HEAD back-to-back on today's
# chip + tunnel, idle host.  If r2 code also reads ~0.097 today the
# regression is environmental (tunnel dispatch); if it reads ~0.081 the
# kernels/loss path changed cost and the diff r2->r3 contains the culprit.
# TPU job (~6 min incl. compiles); chip must be otherwise idle.
set -eu
cd /root/repo
OUT=docs/steprate_bisect.json
WT=/tmp/r2wt

# The tail queue bounds this script with `timeout`, which signals only THIS
# shell — forward termination to the active bench child so no orphaned TPU
# process collides with the next queue step (single-tenant chip).
CHILD=""
trap '[ -n "$CHILD" ] && kill "$CHILD" 2>/dev/null; exit 143' TERM INT

run_bench () {  # workdir  (top-level, NOT in a command substitution: the
  # TERM trap must see $CHILD)
  ( cd "$1" && exec timeout 900 python bench.py --skip-cpu --skip-stt \
      --skip-lbfgs --blocked-iters 10 ) > /tmp/steprate_bench.out &
  CHILD=$!
  wait "$CHILD" || true
  CHILD=""
}

git worktree add -f "$WT" 92e6167 2>/dev/null || git -C "$WT" checkout -f 92e6167
echo "=== r2 code ($(date -u)) ==="
run_bench "$WT"
R2=$(tail -1 /tmp/steprate_bench.out)
echo "$R2"
echo "=== HEAD code ($(date -u)) ==="
run_bench /root/repo
HD=$(tail -1 /tmp/steprate_bench.out)
echo "$HD"
python3 - "$R2" "$HD" <<'EOF'
import json, sys, os
r2, hd = json.loads(sys.argv[1]), json.loads(sys.argv[2])
try:
    load = os.getloadavg()[0]
except OSError:
    load = None
out = {
    "r2_commit": "92e6167",
    "r2_step_seconds": r2.get("step_seconds"),
    "head_step_seconds": hd.get("step_seconds"),
    "r2_evals_per_sec": r2.get("value"),
    "head_evals_per_sec": hd.get("value"),
    "host_load": load,
    "r2_recorded_idle_step_seconds": 0.081192,
    "verdict": ("environmental" if r2.get("step_seconds", 0) > 0.090
                else "code-path regression"),
}
json.dump(out, open("docs/steprate_bisect.json", "w"), indent=1)
print(out)
EOF
git worktree remove -f "$WT" || true
