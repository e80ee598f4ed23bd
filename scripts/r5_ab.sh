#!/bin/bash
# r5 slot 0: the semi wedge-mechanism A/B, run to an actual recorded outcome
# (VERDICT r4 item 1 — the r4b attempt died with one 'start' line because
# its 18-min timeout was consumed by compile + warmup before any progress
# event).  Three hybrid_endgame arms from the SAME wedged checkpoint
# (stage_1_T16.ckpt, 2.549e-3, the curriculum endpoint where BOTH
# line-search engines wedge), Adam escape disabled (--escape-rel 0) so the
# recorded descent is pure L-BFGS:
#   control — plain sprint+drill (the wedge's residual leak)
#   freezeb — --trainable uv.mlp (freeze the Fourier B matrix; prime suspect)
#   precond — --host-first --host-precond (Jacobi whitening in host drill)
# Budgets are generous per-arm (not per-event): each arm must either record
# >=500 effective L-BFGS iterations or a full wedge signature.
set -u
cd /root/repo
export PINN_COMPILE_DEADLINE=${PINN_COMPILE_DEADLINE:-1500}

( while true; do
    sleep 1200
    git add -A runs/ 2>/dev/null
    git diff --cached --quiet 2>/dev/null \
      || git commit -q -m "r5 A/B: periodic training checkpoint snapshot" \
      || true
  done
) & echo $! > /tmp/r5ab_committer.pid
trap 'kill $(cat /tmp/r5ab_committer.pid) 2>/dev/null' EXIT

CK=runs/wave_semi_fourier/stage_1_T16.ckpt
BK='{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}'

run_arm () {  # name, timeout_s, extra flags...
  local name=$1 tmo=$2; shift 2
  echo "=== A/B arm: $name ($(date -u)) ==="
  # shellcheck disable=SC2086
  timeout "$tmo" python scripts/hybrid_endgame.py "$CK" \
    "runs/wave_semi_fourier/ab_${name}.ckpt" --case wave_semi_infinite \
    --max-t 16 --build-kwargs "$BK" --hours 24 --target 2.7e-5 \
    --f32-segment 8 --escape-rel 0 "$@" \
    --metrics "runs/wave_semi_fourier/ab_${name}_metrics.jsonl"
  echo "arm $name rc=$?"
  git add -A runs/wave_semi_fourier \
    && git commit -q -m "r5 A/B: semi $name arm trajectory" || true
}

# freezeb first: it is the prime suspect and the arm whose positive result
# unblocks the plate slot; if the window dies early the decisive data exists.
run_arm freezeb 2700 --trainable uv.mlp
run_arm precond 2400 --host-first --host-precond
run_arm control 1800

python scripts/pick_wedge_flags.py > /tmp/r5_wedge_flags.txt
echo "winning flags: '$(cat /tmp/r5_wedge_flags.txt)'"
git add -A runs/wave_semi_fourier \
  && git commit -q -m "r5 A/B: semi wedge-mechanism verdict (ab_verdict.json)" || true
echo "=== r5 A/B done ($(date -u)) ==="
