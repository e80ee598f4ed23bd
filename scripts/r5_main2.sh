#!/bin/bash
# r5 main queue, revision 2 (18:05 UTC): the plate slot hit its 7.08e-4 bar
# early (17:22, f64-verified 7.0755e-4, FEM regenerated at the bar) and the
# plain-config confined slot showed the wedge signature the A/B just
# diagnosed (rel_drop ~1e-4/block at 0.22 it/s = failing zoom searches).
# This revision relaunches confined WITH the A/B winner flags
# (--trainable uv.mlp, freeze Fourier B) and keeps the semi slot as planned.
#
#   bash scripts/r5_main2.sh CONF_END SEMI_END    (epoch seconds)
set -u
cd /root/repo
export PINN_COMPILE_DEADLINE=${PINN_COMPILE_DEADLINE:-1500}
CONF_END=${1:?epoch end for confined slot}
SEMI_END=${2:?epoch end for semi slot}

( while true; do
    sleep 1200
    git add -A runs/ 2>/dev/null
    git diff --cached --quiet 2>/dev/null \
      || git commit -q -m "r5 queue: periodic training checkpoint snapshot" \
      || true
  done
) & echo $! > /tmp/r5main2_committer.pid
trap 'kill $(cat /tmp/r5main2_committer.pid) 2>/dev/null' EXIT

FLAGS=$(python scripts/pick_wedge_flags.py 2>/dev/null || echo "")
echo "wedge flags from A/B verdict: '$FLAGS'"

run_slot () {  # name, end_epoch, ckpt_in, ckpt_out, case, target, extra...
  local name=$1 end=$2 ck_in=$3 ck_out=$4 case=$5 target=$6; shift 6
  while :; do
    local left=$(( end - $(date +%s) ))
    [ "$left" -gt 420 ] || break
    local H
    H=$(python3 -c "print((${left}-180)/3600.0)")
    echo "=== r5 slot $name (H=$H, $(date -u)) ==="
    # shellcheck disable=SC2086
    timeout $(( left - 60 )) python scripts/hybrid_endgame.py \
      "$ck_in" "$ck_out" --case "$case" --target "$target" \
      --hours "$H" --f32-segment 8 --f32-block 150 --host-block 250 "$@"
    local rc=$?
    echo "slot $name rc=$rc"
    git add -A runs/ && git commit -q -m "r5: $name slot checkpoint" || true
    [ $rc -eq 0 ] && break
    [ $rc -eq 4 ] && break   # deterministic bug: relaunching won't help
    sleep 5
  done
}

measure () {  # ckpt, case, metrics, extra...
  local ck=$1 case=$2 metrics=$3; shift 3
  [ -f "$ck" ] || return 0
  timeout 600 python scripts/measure_ckpt_f64.py "$ck" --case "$case" \
    --metrics "$metrics" --note slot_end_f64_cpu "$@" || true
  git add -A runs/ && git commit -q -m "r5: post-slot f64 measure ($case)" || true
}

# Slot 2 (revised): confined Fourier with the freeze-B winner.  The plain
# arm was asymptoting (3.648e-4 -> 3.644e-4 over 40 min); semi and plate
# both un-wedged from exactly this signature under --trainable uv.mlp.
# shellcheck disable=SC2086
run_slot confined "$CONF_END" \
  runs/wave_confined_fourier/hybrid_best.ckpt \
  runs/wave_confined_fourier/hybrid_best.ckpt \
  wave_confined 3.8e-5 --max-t 14 \
  --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}' \
  $FLAGS --metrics runs/wave_confined_fourier/hybrid_metrics.jsonl
measure runs/wave_confined_fourier/hybrid_best.ckpt wave_confined \
  runs/wave_confined_fourier/hybrid_metrics.jsonl --max-t 14 \
  --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}'

# Slot 3: semi continuation with the winner, from the best A/B arm artifact
# (falls back to the r4 hybrid best).
SEMI_CK=$(python3 - <<'EOF'
import json, os
pick = "runs/wave_semi_fourier/hybrid_best.ckpt"
try:
    v = json.load(open("runs/wave_semi_fourier/ab_verdict.json"))
    w = v.get("verdict", {}).get("winner")
    c = f"runs/wave_semi_fourier/ab_{w}.ckpt"
    if w and w != "control" and os.path.exists(c):
        pick = c
except Exception:
    pass
print(pick)
EOF
)
echo "semi resume checkpoint: $SEMI_CK"
# shellcheck disable=SC2086
run_slot semi "$SEMI_END" \
  "$SEMI_CK" runs/wave_semi_fourier/hybrid_best2.ckpt \
  wave_semi_infinite 2.7e-5 --max-t 16 \
  --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}' \
  $FLAGS --metrics runs/wave_semi_fourier/hybrid2_metrics.jsonl
measure runs/wave_semi_fourier/hybrid_best2.ckpt wave_semi_infinite \
  runs/wave_semi_fourier/hybrid2_metrics.jsonl --max-t 16 \
  --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}'

echo "=== r5 main queue (rev 2) done ($(date -u)) ==="
