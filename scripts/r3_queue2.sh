#!/bin/bash
# Round-3 TPU queue, take 2: strictly serial single-tenant jobs.
#   1. wait for the running ablation (pid passed in $1)
#   2. wave_confined host-f64 endgame (f32 sprints are wedged for this case:
#      26-min cold warmups yield ~0 drop and the first carried block never
#      completed) — relaunch loop, host carry persists in the checkpoint
#   3. inverse polish   4. mms3d MMS training run
set -u
cd /root/repo
WAIT_PID=${1:-}
TPU_DEADLINE=${2:-$(( $(date +%s) + 10000 ))}
CONFINED_MIN=${3:-70}

left () { echo $(( TPU_DEADLINE - $(date +%s) )); }

if [ -n "$WAIT_PID" ]; then
  echo "=== waiting for ablation pid $WAIT_PID ==="
  tail --pid="$WAIT_PID" -f /dev/null
  echo "=== ablation done ($(date -u)) ==="
fi

CONF_END=$(( $(date +%s) + CONFINED_MIN * 60 ))
[ "$CONF_END" -gt "$TPU_DEADLINE" ] && CONF_END=$TPU_DEADLINE
CKOUT=runs/wave_confined/host_best.ckpt
while true; do
  REM=$(( CONF_END - $(date +%s) ))
  [ "$REM" -lt 300 ] && break
  CKIN=runs/wave_confined/endgame_best.ckpt
  [ -f "$CKOUT" ] && CKIN=$CKOUT
  H=$(python3 -c "print($REM/3600.0)")
  echo "=== confined host endgame: ${REM}s left, in=$CKIN ==="
  timeout $(( REM + 120 )) \
    python scripts/host_endgame.py "$CKIN" "$CKOUT" \
      --case wave_confined --max-t 14 --hours "$H" --target 1.5e-4 \
      --metrics runs/wave_confined/endgame_metrics.jsonl
  rc=$?
  echo "host_endgame rc=$rc"
  [ $rc -eq 0 ] && break
  sleep 15
done

if [ "$(left)" -gt 900 ]; then
  echo "=== inverse polish ($(left)s to deadline) ==="
  timeout $(( $(left) < 2100 ? $(left) : 2100 )) \
    python scripts/inverse_polish.py --out runs/inverse --minutes 15 \
      --sens-iters 1000
  echo "inverse rc=$?"
fi

if [ "$(left)" -gt 600 ]; then
  M=$(python3 -c "print(max(5, min(18, ($(left)-300)/60)))")
  echo "=== mms3d ($(left)s to deadline, minutes=$M) ==="
  timeout $(( $(left) - 60 )) \
    python scripts/train_mms3d.py --out runs/elastic3d --minutes "$M"
  echo "mms3d rc=$?"
fi

echo "=== r3 queue2 done ==="
