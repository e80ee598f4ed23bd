#!/bin/bash
# r5 post-chain extension (07:30 UTC Aug 20): the 07:15 session restart
# granted ~7h more wall (to ~14:15 UTC) while chain5 ends ~10:00.  This
# script runs AFTER chain5 exits (watcher: r5_post_watch.sh) and spends the
# extra window on the two open accuracy bars, then closes with measurements:
#   A. confined to the 3.8e-5 bar (stop-on-target 3.7e-5) if chain5's
#      07:50 cap missed it — cap start+50 min;
#   B. semi long slot (resume hybrid_best2/ab_freezeb, freeze-B flags,
#      target 2.7e-5) to SEMI_END;
#   C. f64 CPU measures + FEM regen at the final bests;
#   D. inverse E-recovery CPU block (accel weight annealed to 1.0) with
#      whatever remains to HARD_END.
# Every stage is absolute-epoch-bounded and skips itself if already past or
# met, so a VM-restart relaunch with the same args resumes correctly:
#   setsid bash scripts/r5_post.sh SEMI_END HARD_END
set -u
cd /root/repo
export PINN_COMPILE_DEADLINE=${PINN_COMPILE_DEADLINE:-1500}
SEMI_END=${1:?epoch end for the semi long slot}
HARD_END=${2:?absolute end for everything}

( while true; do
    sleep 1200
    git add -A runs/ docs/ 2>/dev/null
    git diff --cached --quiet 2>/dev/null \
      || git commit -q -m "r5 post: periodic training checkpoint snapshot" || true
  done
) & echo $! > /tmp/r5post_committer.pid
trap 'kill $(cat /tmp/r5post_committer.pid) 2>/dev/null' EXIT

FLAGS=$(python scripts/pick_wedge_flags.py 2>/dev/null || echo "")
echo "=== r5 post start ($(date -u)) flags='$FLAGS' ==="

run_slot () {  # name, end_epoch, ckpt_in, ckpt_out, case, target, extra...
  local name=$1 end=$2 ck_in=$3 ck_out=$4 case=$5 target=$6; shift 6
  while :; do
    local left=$(( end - $(date +%s) ))
    [ "$left" -gt 420 ] || break
    local H
    H=$(python3 -c "print((${left}-180)/3600.0)")
    echo "=== r5post slot $name (H=$H, $(date -u)) ==="
    # shellcheck disable=SC2086
    timeout $(( left - 60 )) python scripts/hybrid_endgame.py \
      "$ck_in" "$ck_out" --case "$case" --target "$target" \
      --hours "$H" --f32-segment 8 --f32-block 150 --host-block 250 "$@"
    local rc=$?
    echo "slot $name rc=$rc"
    git add -A runs/ && git commit -q -m "r5 post: $name slot checkpoint" || true
    [ $rc -eq 0 ] && return 0
    [ $rc -eq 4 ] && return 4
    sleep 5
  done
  return 1
}

measure () {  # ckpt, case, metrics, extra...
  local ck=$1 case=$2 metrics=$3; shift 3
  [ -f "$ck" ] || return 0
  timeout 900 python scripts/measure_ckpt_f64.py "$ck" --case "$case" \
    --metrics "$metrics" --note post_f64_cpu "$@" || true
  git add -A runs/ && git commit -q -m "r5 post: f64 measure ($case)" || true
}

conf_met () {
  python3 - <<'EOF'
import json
lo = None
try:
    with open("runs/wave_confined_fourier/hybrid_metrics.jsonl") as f:
        for line in f:
            try:
                e = json.loads(line)
            except ValueError:
                continue
            v = e.get("loss_f64", e.get("loss_f32", e.get("loss")))
            if isinstance(v, (int, float)) and (lo is None or v < lo):
                lo = v
except OSError:
    pass
print("met" if (lo is not None and lo <= 3.8e-5) else "unmet")
EOF
}

# --- Stage A: confined to the bar if chain5 missed it ------------------------
CONF_END=$(( $(date +%s) + 3000 ))
[ "$CONF_END" -gt "$SEMI_END" ] && CONF_END=$SEMI_END
if [ "$(conf_met)" = unmet ] && [ "$(( CONF_END - $(date +%s) ))" -gt 420 ]; then
  # shellcheck disable=SC2086
  run_slot post_confined "$CONF_END" \
    runs/wave_confined_fourier/hybrid_best.ckpt \
    runs/wave_confined_fourier/hybrid_best.ckpt \
    wave_confined 3.7e-5 --max-t 14 \
    --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}' \
    $FLAGS --metrics runs/wave_confined_fourier/hybrid_metrics.jsonl
  measure runs/wave_confined_fourier/hybrid_best.ckpt wave_confined \
    runs/wave_confined_fourier/hybrid_metrics.jsonl --max-t 14 \
    --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}'
else
  echo "post confined skipped ($(conf_met), $(date -u))"
  # still CPU-f64-verify the checkpoint that met the bar
  measure runs/wave_confined_fourier/hybrid_best.ckpt wave_confined \
    runs/wave_confined_fourier/hybrid_metrics.jsonl --max-t 14 \
    --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}'
fi

# --- Stage A2: measurement tail (MFU, steprate bisect, ablation, idle bench) --
# Chain5's tail stage was superseded (07:45 UTC revision: chain5 killed after
# its confined child exited, so its 40-min semi slot would not burn a full
# remote compile); the tail runs here instead, between the confined bar and
# the long semi slot.  Keep >=2h for semi.
if [ ! -f docs/bench_r5_idle.json ]; then
  TAIL_END=$(( $(date +%s) + 4200 ))
  [ "$TAIL_END" -gt $(( SEMI_END - 7200 )) ] && TAIL_END=$(( SEMI_END - 7200 ))
  if [ "$(( TAIL_END - $(date +%s) ))" -gt 600 ]; then
    bash scripts/r5_tail.sh "$TAIL_END"
  fi
fi

# --- Stage B: semi long slot --------------------------------------------------
SEMI_CK=runs/wave_semi_fourier/hybrid_best2.ckpt
[ -f "$SEMI_CK" ] || SEMI_CK=runs/wave_semi_fourier/ab_freezeb.ckpt
echo "semi resume checkpoint: $SEMI_CK"
if [ "$(( SEMI_END - $(date +%s) ))" -gt 420 ]; then
  # shellcheck disable=SC2086
  run_slot post_semi "$SEMI_END" \
    "$SEMI_CK" runs/wave_semi_fourier/hybrid_best2.ckpt \
    wave_semi_infinite 2.7e-5 --max-t 16 \
    --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}' \
    $FLAGS --metrics runs/wave_semi_fourier/hybrid2_metrics.jsonl
fi

# --- Stage C: f64 measures + FEM regen at the final bests ---------------------
measure runs/wave_semi_fourier/hybrid_best2.ckpt wave_semi_infinite \
  runs/wave_semi_fourier/hybrid2_metrics.jsonl --max-t 16 \
  --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}'
timeout 1500 env JAX_PLATFORMS=cpu python scripts/regen_artifacts.py \
  wave_confined_fourier wave_semi_fourier || true
git add -A runs/ docs/ && git commit -q -m "r5 post: FEM regen at final bests" || true

# --- Stage D: inverse E-recovery (CPU) ----------------------------------------
LEFT=$(( HARD_END - $(date +%s) ))
if [ "$LEFT" -gt 900 ]; then
  MIN=$(python3 -c "print(max(5, (${LEFT}-300)//60))")
  timeout $(( LEFT - 120 )) env JAX_PLATFORMS=cpu \
    python scripts/inverse_accel.py --minutes "$MIN" --accel-weight 1.0 || true
  git add -A runs/ && git commit -q -m "r5 post: inverse E-recovery block" || true
fi

echo "=== r5 post done ($(date -u)) ==="
