#!/bin/bash
# r5 final window (04:20 UTC Aug 20): the running chain4 hard-ends at
# 1787217000 (09:10 UTC) — a deadline computed by an EARLIER agent session.
# The current session runs to ~10:40, so ~50 minutes of chip time exist past
# the chain's end.  This script waits for the chain to release the
# single-tenant chip, then spends the extra window on the case nearest its
# accuracy bar (log-distance), ending with enough margin for the driver's
# round-end bench.py capture on an idle chip+host.
#
#   bash scripts/r5_final.sh CHAIN_PID TRAIN_END_EPOCH
set -u
cd /root/repo
export PINN_COMPILE_DEADLINE=${PINN_COMPILE_DEADLINE:-1200}
CHAIN_PID=${1:?pid of the running r5_chain4.sh}
TRAIN_END=${2:?epoch seconds: hard stop for training dispatches}

while kill -0 "$CHAIN_PID" 2>/dev/null; do
  [ "$(( TRAIN_END - $(date +%s) ))" -gt 600 ] || { echo "final: chain still running at deadline; abort"; exit 0; }
  sleep 60
done
echo "=== r5 final window start ($(date -u)) ==="

( while true; do
    sleep 1200
    git add -A runs/ docs/ 2>/dev/null
    git diff --cached --quiet 2>/dev/null \
      || git commit -q -m "r5 final: periodic training checkpoint snapshot" || true
  done
) & echo $! > /tmp/r5final_committer.pid
trap 'kill $(cat /tmp/r5final_committer.pid) 2>/dev/null' EXIT

# Pick the case with the smallest remaining log-distance to its bar.
PICK=$(python3 - <<'EOF'
import json, math, os
arms = [
    # (name, metrics jsonl, ckpt, case, bar, max_t)
    ("confined", "runs/wave_confined_fourier/hybrid_metrics.jsonl",
     "runs/wave_confined_fourier/hybrid_best.ckpt", "wave_confined", 3.8e-5, 14),
    ("semi", "runs/wave_semi_fourier/hybrid2_metrics.jsonl",
     "runs/wave_semi_fourier/hybrid_best2.ckpt", "wave_semi_infinite", 2.7e-5, 16),
]
best = None
for name, mpath, ck, case, bar, mt in arms:
    if not (os.path.exists(mpath) and os.path.exists(ck)):
        continue
    lo = None
    with open(mpath) as f:
        for line in f:
            try:
                e = json.loads(line)
            except ValueError:
                continue
            v = e.get("loss_f64", e.get("loss_f32", e.get("loss")))
            if isinstance(v, (int, float)) and (lo is None or v < lo):
                lo = v
    if lo is None or lo <= bar:
        continue  # unreadable or already at its bar — nothing to close
    d = math.log(lo / bar)
    if best is None or d < best[0]:
        best = (d, name, ck, case, bar, mt, lo)
if best is None:
    print("none")
else:
    print(" ".join(str(x) for x in best[1:]))
EOF
)
echo "final pick: $PICK"
[ "$PICK" = "none" ] && exit 0
read -r NAME CK CASE BAR MAXT LOSS <<< "$PICK"
MET=$(dirname "$CK")/hybrid_metrics.jsonl
[ "$NAME" = semi ] && MET=runs/wave_semi_fourier/hybrid2_metrics.jsonl
FLAGS=$(python scripts/pick_wedge_flags.py 2>/dev/null || echo "")

while :; do
  LEFT=$(( TRAIN_END - $(date +%s) ))
  [ "$LEFT" -gt 420 ] || break
  H=$(python3 -c "print((${LEFT}-120)/3600.0)")
  echo "=== r5 final slot $NAME from $LOSS (H=$H, $(date -u)) ==="
  # shellcheck disable=SC2086
  timeout $(( LEFT - 60 )) python scripts/hybrid_endgame.py \
    "$CK" "$CK" --case "$CASE" --target "$BAR" \
    --hours "$H" --f32-segment 8 --f32-block 150 --host-block 250 \
    --max-t "$MAXT" \
    --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}' \
    $FLAGS --metrics "$MET"
  rc=$?
  echo "final slot rc=$rc"
  git add -A runs/ && git commit -q -m "r5 final: $NAME slot checkpoint" || true
  [ $rc -eq 0 ] && break
  [ $rc -eq 4 ] && break
  sleep 5
done

timeout 600 python scripts/measure_ckpt_f64.py "$CK" --case "$CASE" \
  --metrics "$MET" --note final_end_f64_cpu --max-t "$MAXT" \
  --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}' || true
git add -A runs/ && git commit -q -m "r5 final: post-slot f64 measure ($CASE)" || true

# FEM regen only if there is still margin before the driver's bench.
if [ "$(( $(date +%s) - TRAIN_END ))" -lt 900 ]; then
  timeout 900 env JAX_PLATFORMS=cpu python scripts/regen_artifacts.py \
    "$(basename "$(dirname "$CK")")" || true
  git add -A runs/ && git commit -q -m "r5 final: FEM regen at final best" || true
fi
echo "=== r5 final window done ($(date -u)) ==="
