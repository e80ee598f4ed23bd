#!/bin/bash
# Relaunch loop for the wave_confined hybrid endgame: the axon chip faults
# sporadically under sustained load (~35-40 min); hybrid_endgame.py resumes
# from its own output checkpoint (x64_flat + block fault insurance), so the
# outer loop just relaunches until a global deadline or the target is hit.
set -u
DEADLINE=$(( $(date +%s) + ${1:-5400} ))   # default 90 min total
cd /root/repo
while true; do
  REMAIN=$(( DEADLINE - $(date +%s) ))
  if [ "$REMAIN" -lt 120 ]; then echo "=== deadline reached ==="; break; fi
  HOURS=$(python3 -c "print(min($REMAIN/3600.0, 0.75))")
  echo "=== launch: ${REMAIN}s remaining, per-launch hours=$HOURS ==="
  timeout $(( REMAIN < 2700 ? REMAIN : 2700 )) \
    python scripts/hybrid_endgame.py \
      runs/wave_confined/wave_confined_final.ckpt \
      runs/wave_confined/endgame_best.ckpt \
      --case wave_confined --max-t 14 --hours "$HOURS" --target 1.5e-4 \
      --host-first \
      --metrics runs/wave_confined/endgame_metrics.jsonl
  rc=$?
  echo "hybrid exited rc=$rc"
  if [ $rc -eq 0 ]; then
    # Completed its budget or hit target; check target before relaunching.
    DONE=$(python3 - <<'EOF'
import json
last = {}
for line in open("runs/wave_confined/endgame_metrics.jsonl"):
    rec = json.loads(line)
    if rec.get("event") == "done":
        last = rec
print("yes" if last.get("loss", 1.0) <= 1.5e-4 else "no")
EOF
)
    if [ "$DONE" = "yes" ]; then echo "=== target hit ==="; break; fi
  fi
  sleep 15   # let a faulted chip settle
done
echo "=== confined chain done ==="
