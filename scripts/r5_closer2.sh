#!/bin/bash
# r5 closer 2 (fifth agent session, 08:50 UTC Aug 20): spends the agent's
# extra wall (r5_post2's HARD_END 13:40 -> ~15:45) on the one open bar.
#
#   1. wait for the r5_post2 shell (WAIT_PID) to exit;
#   2. semi closer slot on TPU: resume hybrid_best2 (freeze-B winner flags,
#      stop-on-target 2.7e-5) until SEMI2_END;
#   3. f64 CPU measure of the final semi best;
#   4. full test suite (CPU, only thing on the 1-core host);
#   5. leave the chip idle for the driver's bench run.
#
# Every stage is absolute-epoch-bounded and skips itself if already met.
# VM-restart relaunch: setsid bash scripts/r5_closer2.sh 0 SEMI2_END TEST_END
set -u
cd /root/repo
export PINN_COMPILE_DEADLINE=${PINN_COMPILE_DEADLINE:-2700}
WAIT_PID=${1:?pid of the r5_post2 shell (0 if none)}
SEMI2_END=${2:?epoch end for the semi closer slot}
TEST_END=${3:?epoch end for the test suite}

( while true; do
    sleep 1200
    git add -A runs/ docs/ 2>/dev/null
    git diff --cached --quiet 2>/dev/null \
      || git commit -q -m "r5 closer2: periodic training checkpoint snapshot" || true
  done
) & echo $! > /tmp/r5closer2_committer.pid
trap 'kill $(cat /tmp/r5closer2_committer.pid) 2>/dev/null' EXIT

if [ "$WAIT_PID" -gt 0 ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
echo "=== r5 closer2 start ($(date -u)) ==="
FLAGS=$(python scripts/pick_wedge_flags.py 2>/dev/null || echo "")
echo "flags='$FLAGS'"

semi_met () {
  python3 - <<'EOF'
import json
lo = None
for p in ("runs/wave_semi_fourier/hybrid2_metrics.jsonl",):
    try:
        with open(p) as f:
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
print("met" if (lo is not None and lo <= 2.7e-5) else "unmet")
EOF
}

SEMI_CK=runs/wave_semi_fourier/hybrid_best2.ckpt
[ -f "$SEMI_CK" ] || SEMI_CK=runs/wave_semi_fourier/ab_freezeb.ckpt

# --- Stage 1: semi closer slot -------------------------------------------
if [ "$(semi_met)" = unmet ]; then
  while :; do
    LEFT=$(( SEMI2_END - $(date +%s) ))
    [ "$LEFT" -gt 420 ] || break
    H=$(python3 -c "print((${LEFT}-180)/3600.0)")
    echo "=== closer2 semi slot (H=$H, $(date -u)) ==="
    # shellcheck disable=SC2086
    timeout $(( LEFT - 60 )) python scripts/hybrid_endgame.py \
      "$SEMI_CK" runs/wave_semi_fourier/hybrid_best2.ckpt \
      --case wave_semi_infinite --target 2.7e-5 \
      --hours "$H" --f32-segment 8 --f32-block 150 --host-block 250 \
      --max-t 16 \
      --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}' \
      $FLAGS --metrics runs/wave_semi_fourier/hybrid2_metrics.jsonl
    rc=$?
    echo "closer2 semi rc=$rc"
    git add -A runs/ && git commit -q -m "r5 closer2: semi slot checkpoint" || true
    SEMI_CK=runs/wave_semi_fourier/hybrid_best2.ckpt
    [ $rc -eq 0 ] && break
    [ $rc -eq 4 ] && break
    sleep 5
  done
fi

# --- Stage 2: f64 measure of the final semi best --------------------------
if [ -f runs/wave_semi_fourier/hybrid_best2.ckpt ]; then
  timeout 900 python scripts/measure_ckpt_f64.py \
    runs/wave_semi_fourier/hybrid_best2.ckpt --case wave_semi_infinite \
    --metrics runs/wave_semi_fourier/hybrid2_metrics.jsonl \
    --note closer2_f64_cpu --max-t 16 \
    --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}' || true
  git add -A runs/ && git commit -q -m "r5 closer2: semi f64 measure" || true
fi

# --- Stage 3: full test suite (CPU; chip left idle from here) --------------
LEFT=$(( TEST_END - $(date +%s) ))
if [ "$LEFT" -gt 600 ]; then
  timeout $(( LEFT - 60 )) python -m pytest tests/ -q 2>&1 \
    | tail -15 | tee /tmp/r5_final_tests.txt
  git add -A runs/ docs/ 2>/dev/null
  git commit -q -m "r5 closer2: final artifacts" || true
fi

echo "=== r5 closer2 done ($(date -u)) ==="
