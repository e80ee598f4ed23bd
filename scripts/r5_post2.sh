#!/bin/bash
# r5 post revision 2 (08:28 UTC Aug 20): r5_post.sh's stage A launched at
# 07:48 but its block executables paid back-to-back ~20-min remote compiles
# (warmup landed 08:22), leaving ~0 min of sprint blocks before the 08:37
# wrapper timeout — projected to miss the 3.8e-5 bar by a few percent.
# This script replaces r5_post.sh (shell killed; training child untouched):
# it waits for the in-flight confined child to exit, then runs, in order,
#   A'. confined extension, stop-on-target 3.7e-5, cap CONF_END — the bar
#       comes FIRST (four VM restarts this round; minimize exposure);
#   A2. measurement tail (r5_tail.sh) if the idle bench is still missing,
#       capped to leave >=110 min for semi;
#   B.  semi long slot (freeze-B flags, target 2.7e-5) to SEMI_END;
#   C.  f64 CPU measures + FEM regen at the final bests;
#   D.  inverse E-recovery CPU block to HARD_END.
# Every stage is absolute-epoch-bounded and skips itself if already past or
# met.  VM-restart relaunch (WAIT_PID=0 if no child is running):
#   setsid bash scripts/r5_post2.sh 0 CONF_END SEMI_END HARD_END
set -u
cd /root/repo
export PINN_COMPILE_DEADLINE=${PINN_COMPILE_DEADLINE:-2700}
WAIT_PID=${1:?pid of the in-flight training child (0 if none)}
CONF_END=${2:?epoch end for the confined extension}
SEMI_END=${3:?epoch end for the semi long slot}
HARD_END=${4:?absolute end for everything}

( while true; do
    sleep 1200
    git add -A runs/ docs/ 2>/dev/null
    git diff --cached --quiet 2>/dev/null \
      || git commit -q -m "r5 post2: periodic training checkpoint snapshot" || true
  done
) & echo $! > /tmp/r5post2_committer.pid
trap 'kill $(cat /tmp/r5post2_committer.pid) 2>/dev/null' EXIT

if [ "$WAIT_PID" -gt 0 ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
fi
echo "=== r5 post2 start ($(date -u)) ==="
FLAGS=$(python scripts/pick_wedge_flags.py 2>/dev/null || echo "")
echo "flags='$FLAGS'"

run_slot () {  # name, end_epoch, ckpt_in, ckpt_out, case, target, extra...
  local name=$1 end=$2 ck_in=$3 ck_out=$4 case=$5 target=$6; shift 6
  while :; do
    local left=$(( end - $(date +%s) ))
    [ "$left" -gt 420 ] || break
    local H
    H=$(python3 -c "print((${left}-180)/3600.0)")
    echo "=== r5post2 slot $name (H=$H, $(date -u)) ==="
    # shellcheck disable=SC2086
    timeout $(( left - 60 )) python scripts/hybrid_endgame.py \
      "$ck_in" "$ck_out" --case "$case" --target "$target" \
      --hours "$H" --f32-segment 8 --f32-block 150 --host-block 250 "$@"
    local rc=$?
    echo "slot $name rc=$rc"
    git add -A runs/ && git commit -q -m "r5 post2: $name slot checkpoint" || true
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
    --metrics "$metrics" --note post2_f64_cpu "$@" || true
  git add -A runs/ && git commit -q -m "r5 post2: f64 measure ($case)" || true
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

# --- Stage A': confined extension to the bar (FIRST: minimize restart risk) ---
if [ "$(conf_met)" = unmet ] && [ "$(( CONF_END - $(date +%s) ))" -gt 420 ]; then
  # shellcheck disable=SC2086
  run_slot post2_confined "$CONF_END" \
    runs/wave_confined_fourier/hybrid_best.ckpt \
    runs/wave_confined_fourier/hybrid_best.ckpt \
    wave_confined 3.7e-5 --max-t 14 \
    --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}' \
    $FLAGS --metrics runs/wave_confined_fourier/hybrid_metrics.jsonl
fi
measure runs/wave_confined_fourier/hybrid_best.ckpt wave_confined \
  runs/wave_confined_fourier/hybrid_metrics.jsonl --max-t 14 \
  --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}'

# --- Stage A2: measurement tail (MFU, steprate bisect, ablation, idle bench) --
if [ ! -f docs/bench_r5_idle.json ]; then
  TAIL_END=$(( $(date +%s) + 4200 ))
  [ "$TAIL_END" -gt $(( SEMI_END - 6600 )) ] && TAIL_END=$(( SEMI_END - 6600 ))
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
  run_slot post2_semi "$SEMI_END" \
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
git add -A runs/ docs/ && git commit -q -m "r5 post2: FEM regen at final bests" || true

# --- Stage D: inverse E-recovery (CPU) ----------------------------------------
LEFT=$(( HARD_END - $(date +%s) ))
if [ "$LEFT" -gt 900 ]; then
  MIN=$(python3 -c "print(max(5, (${LEFT}-300)//60))")
  timeout $(( LEFT - 120 )) env JAX_PLATFORMS=cpu \
    python scripts/inverse_accel.py --minutes "$MIN" --accel-weight 1.0 || true
  git add -A runs/ && git commit -q -m "r5 post2: inverse E-recovery block" || true
fi

echo "=== r5 post2 done ($(date -u)) ==="
