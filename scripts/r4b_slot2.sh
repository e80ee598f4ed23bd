#!/bin/bash
# r4b slot 2: semi wedge-mechanism A/B (freeze-B vs host-precond), then the
# plate analytic+Fourier continuation with the winning flags.
#
# Rationale: at full scale both line-search engines wedge on the Fourier
# arms (semi at ~2.5e-3, plate at 0.373; docs/STATUS_r4.md) and the prime
# suspect is the jointly-trained B matrix.  Dotted-path freezing
# (--trainable uv.mlp) and Jacobi host preconditioning (--host-precond) are
# the two levers built this session; 12 TPU minutes each from the wedged
# semi checkpoint decide which one the plate gets.
set -u
cd /root/repo
export PINN_COMPILE_DEADLINE=${PINN_COMPILE_DEADLINE:-1500}
SLOT_END=${1:?epoch seconds hard stop}
left () { echo $(( SLOT_END - $(date +%s) )); }

( while true; do
    sleep 1200
    git add -A runs/ 2>/dev/null
    git diff --cached --quiet 2>/dev/null \
      || git commit -q -m "r4b queue: periodic training checkpoint snapshot" \
      || true
  done
) & echo $! > /tmp/r4b2_committer.pid
trap 'kill $(cat /tmp/r4b2_committer.pid) 2>/dev/null' EXIT

SEMI_CK=runs/wave_semi_fourier/hybrid_best.ckpt

echo "=== A/B arm 1: semi freeze-B ($(date -u)) ==="
timeout 1080 python scripts/hybrid_endgame.py "$SEMI_CK" \
  runs/wave_semi_fourier/freezeb.ckpt --case wave_semi_infinite --max-t 16 \
  --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}' \
  --trainable uv.mlp --hours 0.2 --target 2.7e-5 --f32-segment 8 \
  --metrics runs/wave_semi_fourier/freezeb_metrics.jsonl
git add -A runs/wave_semi_fourier && git commit -q -m "r4b A/B: semi freeze-B arm" || true

echo "=== A/B arm 2: semi host-precond ($(date -u)) ==="
timeout 1080 python scripts/hybrid_endgame.py "$SEMI_CK" \
  runs/wave_semi_fourier/precond.ckpt --case wave_semi_infinite --max-t 16 \
  --build-kwargs '{"fourier": 64, "fourier_scale": 1.0, "bc": "hard"}' \
  --host-first --host-precond --hours 0.2 --target 2.7e-5 --f32-segment 8 \
  --metrics runs/wave_semi_fourier/precond_metrics.jsonl
git add -A runs/wave_semi_fourier && git commit -q -m "r4b A/B: semi host-precond arm" || true

FLAGS=$(python scripts/pick_wedge_flags.py)
echo "=== plate continuation with flags: '$FLAGS' ($(date -u)) ==="

while [ "$(left)" -gt 600 ]; do
  H=$(python3 -c "print(($(left)-180)/3600.0)")
  echo "=== r4b slot2: plate analytic+fourier hybrid (H=$H, $(date -u)) ==="
  # shellcheck disable=SC2086
  timeout $(( $(left) - 60 )) \
    python scripts/hybrid_endgame.py runs/plate_analytic/best.ckpt \
      runs/plate_analytic/hybrid_best.ckpt --case plate_hole \
      --build-kwargs '{"fourier": 64, "fourier_scale": 2.0, "bc": "analytic"}' \
      $FLAGS --hours "$H" --target 7.08e-4 --f32-segment 8 \
      --metrics runs/plate_analytic/hybrid_metrics.jsonl
  rc=$?; echo "plate rc=$rc"
  git add -A runs/plate_analytic && git commit -q -m "r4b: plate analytic+Fourier hybrid checkpoint" || true
  [ $rc -eq 0 ] && break
  sleep 5
done
echo "=== r4b slot2 done ($(date -u)) ==="
