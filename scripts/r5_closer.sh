#!/bin/bash
# r5 closer: post-tail continuation slot.  The r5 chain (main rev 2 + tail)
# ends ~04:40 UTC; the agent window ends ~06:58.  This spends the gap on the
# case closest to its accuracy bar — confined Fourier (bar 3.8e-5) — and, if
# that hits target early, gives the remainder to semi (bar 2.7e-5).  Ends
# with an f64 CPU measure + FEM regen for whatever it touched, so the round
# closes with artifacts matching the final best checkpoints.
#
#   bash scripts/r5_closer.sh END_EPOCH [CHAIN_PID]
set -u
cd /root/repo
export PINN_COMPILE_DEADLINE=${PINN_COMPILE_DEADLINE:-1500}
END=${1:?epoch seconds hard stop}
CHAIN_PID=${2:-}

# Wait for the running chain to release the single-tenant chip.
if [ -n "$CHAIN_PID" ]; then
  while kill -0 "$CHAIN_PID" 2>/dev/null; do
    [ "$(( END - $(date +%s) ))" -gt 600 ] || { echo "closer: chain still running at deadline; abort"; exit 0; }
    sleep 60
  done
fi
echo "=== r5 closer start ($(date -u)) ==="

( while true; do
    sleep 1200
    git add -A runs/ docs/ 2>/dev/null
    git diff --cached --quiet 2>/dev/null \
      || git commit -q -m "r5 closer: periodic training checkpoint snapshot" || true
  done
) & echo $! > /tmp/r5closer_committer.pid
trap 'kill $(cat /tmp/r5closer_committer.pid) 2>/dev/null' EXIT

FLAGS=$(python scripts/pick_wedge_flags.py 2>/dev/null || echo "")

run_slot () {  # name, end_epoch, ckpt_in, ckpt_out, case, target, extra...
  local name=$1 end=$2 ck_in=$3 ck_out=$4 case=$5 target=$6; shift 6
  while :; do
    local left=$(( end - $(date +%s) ))
    [ "$left" -gt 420 ] || break
    local H
    H=$(python3 -c "print((${left}-180)/3600.0)")
    echo "=== r5 closer slot $name (H=$H, $(date -u)) ==="
    # shellcheck disable=SC2086
    timeout $(( left - 60 )) python scripts/hybrid_endgame.py \
      "$ck_in" "$ck_out" --case "$case" --target "$target" \
      --hours "$H" --f32-segment 8 --f32-block 150 --host-block 250 "$@"
    local rc=$?
    echo "closer slot $name rc=$rc"
    git add -A runs/ && git commit -q -m "r5 closer: $name slot checkpoint" || true
    [ $rc -eq 0 ] && return 0
    [ $rc -eq 4 ] && return 4
    sleep 5
  done
  return 1
}

measure () {  # ckpt, case, metrics, extra...
  local ck=$1 case=$2 metrics=$3; shift 3
  [ -f "$ck" ] || return 0
  timeout 600 python scripts/measure_ckpt_f64.py "$ck" --case "$case" \
    --metrics "$metrics" --note closer_end_f64_cpu "$@" || true
  git add -A runs/ && git commit -q -m "r5 closer: post-slot f64 measure ($case)" || true
}

CONF_END=$END
# shellcheck disable=SC2086
run_slot confined "$CONF_END" \
  runs/wave_confined_fourier/hybrid_best.ckpt \
  runs/wave_confined_fourier/hybrid_best.ckpt \
  wave_confined 3.8e-5 --max-t 14 \
  --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}' \
  $FLAGS --metrics runs/wave_confined_fourier/hybrid_metrics.jsonl
rc=$?
if [ "$rc" -eq 0 ] && [ "$(( END - $(date +%s) ))" -gt 1500 ]; then
  SEMI_CK=runs/wave_semi_fourier/hybrid_best2.ckpt
  [ -f "$SEMI_CK" ] || SEMI_CK=runs/wave_semi_fourier/ab_freezeb.ckpt
  # shellcheck disable=SC2086
  run_slot semi $(( END - 900 )) \
    "$SEMI_CK" runs/wave_semi_fourier/hybrid_best2.ckpt \
    wave_semi_infinite 2.7e-5 --max-t 16 \
    --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}' \
    $FLAGS --metrics runs/wave_semi_fourier/hybrid2_metrics.jsonl
  measure runs/wave_semi_fourier/hybrid_best2.ckpt wave_semi_infinite \
    runs/wave_semi_fourier/hybrid2_metrics.jsonl --max-t 16 \
    --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}'
fi
measure runs/wave_confined_fourier/hybrid_best.ckpt wave_confined \
  runs/wave_confined_fourier/hybrid_metrics.jsonl --max-t 14 \
  --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}'

# FEM errors at the final bests (only the run dirs this slot touched).
timeout 1200 python scripts/regen_artifacts.py wave_confined_fourier wave_semi_fourier || true
git add -A runs/ docs/ && git commit -q -m "r5 closer: FEM regen at final bests" || true

echo "=== r5 closer done ($(date -u)) ==="
