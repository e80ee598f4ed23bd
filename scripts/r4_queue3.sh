#!/bin/bash
# Round-4 TPU queue, take 3 — relaunched after the second VM restart of the
# round (host rebooted between 18:0x and 01:18 UTC; working tree restored to
# the last 20-min snapshot commit, so slot B kept its stage-0 + live stage-1
# checkpoints and slot C lost only its start event).
#
# Changes vs take 2:
#   * Every wave slot is now curriculum THEN hybrid closer: stage-0 semi
#     wedged at 2.59e-3 under pure-f32 L-BFGS (patience-stop, same pathology
#     as plate slot A), so each slot spends ~60% on the curriculum and the
#     rest on scripts/hybrid_endgame.py (f32 sprints + host-f64 drills +
#     Adam-escape rung) at the final horizon.
#   * Plate closer unchanged: hybrid endgame from runs/plate_analytic/best
#     (loss 0.373) with all remaining time.
# Inherits: 20-min background committer, PINN_COMPILE_DEADLINE watchdog,
# probe-until-chip-up, strictly serial single-tenant chip.
set -u
cd /root/repo

export PINN_COMPILE_DEADLINE=${PINN_COMPILE_DEADLINE:-1500}
TRAIN_END=${1:?epoch seconds when training slots must stop}
left () { echo $(( TRAIN_END - $(date +%s) )); }

( while true; do
    sleep 1200
    git add -A runs/ 2>/dev/null
    git diff --cached --quiet 2>/dev/null \
      || git commit -q -m "r4 queue: periodic training checkpoint snapshot" \
      || true
  done
) & echo $! > /tmp/r4_committer.pid
trap 'kill $(cat /tmp/r4_committer.pid) 2>/dev/null' EXIT

while [ "$(left)" -gt 900 ]; do
  echo "=== probe backend init ($(left)s to train-end, $(date -u)) ==="
  timeout 1800 python -c "import jax; print(jax.devices())" && break
  echo "probe failed rc=$?"; sleep 30
done
[ "$(left)" -le 900 ] && { echo "chip never came back"; exit 1; }
echo "=== CHIP UP at $(date -u), window $(left)s ==="
W=$(left)

run_slot () {  # name case out max_t stages... -- target slot_end curr_end
  local name=$1 case=$2 out=$3 maxt=$4 stages=$5 target=$6 \
        slot_end=$7 curr_end=$8 fscale=$9
  while [ "$(date +%s)" -lt "$(( curr_end - 300 ))" ]; do
    echo "=== slot $name: curriculum ($(date -u)) ==="
    timeout $(( curr_end - $(date +%s) + 60 )) \
      python scripts/train_wave.py --case "$case" --out "$out" \
        --fourier 64 --fourier-scale "$fscale" --bc hard \
        --stages $stages --adam 3000 --log-every 250 --target "$target"
    rc=$?; echo "slot $name curriculum rc=$rc"
    [ $rc -eq 0 ] && break
    sleep 10
  done
  local ck="$out/${case}_final.ckpt"
  [ -f "$ck" ] || ck="$out/stage_1_live.ckpt"
  [ -f "$ck" ] || ck="$out/stage_0_live.ckpt"
  [ -f "$ck" ] || { echo "slot $name: no checkpoint, skipping hybrid"; return; }
  while [ "$(date +%s)" -lt "$(( slot_end - 420 ))" ]; do
    local H
    H=$(python3 -c "print((${slot_end} - $(date +%s) - 120)/3600.0)")
    echo "=== slot $name: hybrid closer H=$H ($(date -u)) ==="
    timeout $(( slot_end - $(date +%s) + 60 )) \
      python scripts/hybrid_endgame.py "$ck" "$out/hybrid_best.ckpt" \
        --case "$case" --max-t "$maxt" \
        --build-kwargs "{\"fourier\": 64, \"fourier_scale\": $fscale, \"bc\": \"hard\"}" \
        --hours "$H" --target "$target" \
        --metrics "$out/hybrid_metrics.jsonl"
    rc=$?; echo "slot $name hybrid rc=$rc"
    [ $rc -eq 0 ] && break
    sleep 10
  done
  git add -A "$out" && git commit -q -m "r4 slot $name: hard+Fourier curriculum + hybrid closer checkpoint" || true
}

# ---- Slot B: semi hard+Fourier, resume stage 1 (30% of window) ------------
NOW=$(date +%s)
run_slot B wave_semi_infinite runs/wave_semi_fourier 16 "8:12000 16:15000" \
  2.7e-5 $(( NOW + W * 30 / 100 )) $(( NOW + W * 18 / 100 )) 1.0

# ---- Slot C: confined hard+Fourier from scratch (34%) ---------------------
NOW=$(date +%s)
C_END=$(( NOW + W * 34 / 100 )); [ "$C_END" -gt "$TRAIN_END" ] && C_END=$TRAIN_END
run_slot C wave_confined runs/wave_confined_fourier 14 "7:12000 14:15000" \
  3.8e-5 "$C_END" $(( NOW + W * 20 / 100 )) 1.0

# ---- Closer: plate analytic hybrid endgame (all remaining time) -----------
while [ "$(left)" -gt 900 ]; do
  H=$(python3 -c "print(($(left)-420)/3600.0)")
  echo "=== closer: plate analytic hybrid endgame (H=$H, $(date -u)) ==="
  timeout $(( $(left) - 240 )) \
    python scripts/hybrid_endgame.py runs/plate_analytic/best.ckpt \
      runs/plate_analytic/hybrid_best.ckpt --case plate_hole \
      --build-kwargs '{"fourier": 64, "fourier_scale": 2.0, "bc": "analytic"}' \
      --hours "$H" --target 7.08e-4 \
      --metrics runs/plate_analytic/hybrid_metrics.jsonl
  echo "closer rc=$?"
  git add -A runs/plate_analytic && git commit -q -m "r4 closer: plate analytic hybrid endgame checkpoint" || true
  sleep 15
done

echo "=== r4 queue3 done ($(date -u)) ==="
