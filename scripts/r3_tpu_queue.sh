#!/bin/bash
# Round-3 TPU job queue: waits for the confined endgame chain to exit, then
# runs the remaining single-tenant TPU jobs serially (the chip wedges if two
# processes touch it at once — CLAUDE.md).  Each job is timeout-bounded and
# crash-tolerant (scripts write artifacts incrementally); a hard deadline
# leaves a CPU-only window at the end of the round for tests/scaling/bench.
set -u
cd /root/repo
WAIT_PID=${1:-}
TPU_DEADLINE=${2:-$(( $(date +%s) + 12000 ))}

left () { echo $(( TPU_DEADLINE - $(date +%s) )); }

if [ -n "$WAIT_PID" ]; then
  echo "=== waiting for pid $WAIT_PID (confined chain) ==="
  tail --pid="$WAIT_PID" -f /dev/null
fi

if [ "$(left)" -gt 900 ]; then
  echo "=== ablation ($(left)s to deadline) ==="
  timeout $(( $(left) < 3000 ? $(left) : 3000 )) \
    python scripts/ablation.py --out runs/ablation_semi --minutes 8
  echo "ablation rc=$?"
fi

if [ "$(left)" -gt 900 ]; then
  echo "=== inverse polish ($(left)s to deadline) ==="
  timeout $(( $(left) < 2400 ? $(left) : 2400 )) \
    python scripts/inverse_polish.py --out runs/inverse --minutes 15 \
      --sens-iters 1000
  echo "inverse rc=$?"
fi

if [ "$(left)" -gt 900 ]; then
  echo "=== mms3d ($(left)s to deadline) ==="
  timeout $(( $(left) < 1800 ? $(left) : 1800 )) \
    python scripts/train_mms3d.py --out runs/elastic3d --minutes 15
  echo "mms3d rc=$?"
fi

while [ "$(left)" -gt 600 ]; do
  M=$(python3 -c "print(max(5, min(25, ($(left)-120)/60)))")
  echo "=== plate_fourier continuation ($(left)s to deadline, minutes=$M) ==="
  timeout $(( $(left) - 60 )) \
    python scripts/plate_fourier.py --out runs/plate_fourier --minutes "$M" \
      --block 500
  echo "plate_fourier rc=$?"
  sleep 10
done

echo "=== r3 TPU queue done ==="
