#!/bin/bash
# r5 master chain: wait for the slot-0 A/B (scripts/r5_ab.sh) to exit, then
# run the main training queue (plate -> confined -> semi) and the tail
# (measurement + hygiene).  Slot budgets sized for a ~02:28 UTC round end
# with a driver buffer:
#   plate    until 20:40 UTC (flagship, VERDICT item 2)
#   confined until 22:10 UTC (item 3)
#   semi     until 23:55 UTC (item 8)
#   tail     until 02:00 UTC (items 4/6/9 + inverse E recovery + tests)
set -u
cd /root/repo

AB_PID=$(cat /tmp/r5_ab.pid 2>/dev/null || echo "")
if [ -n "$AB_PID" ]; then
  while kill -0 "$AB_PID" 2>/dev/null; do sleep 20; done
fi
echo "=== A/B queue done, starting main queue ($(date -u)) ==="

bash scripts/r5_main.sh 1787172000 1787177400 1787183700
bash scripts/r5_tail.sh 1787191200
echo "=== r5 chain done ($(date -u)) ==="
