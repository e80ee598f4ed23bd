#!/bin/bash
# r4b master: wait for slot 1 (confined), then slot 2 (A/B + plate), then tail.
set -u
cd /root/repo
SLOT2_END=$(date -d '12:45' +%s)
TAIL_END=$(date -d '14:33' +%s)
while kill -0 $(cat /tmp/r4b_queue2.pid 2>/dev/null) 2>/dev/null; do sleep 30; done
echo "=== master: slot 1 done, starting slot 2 ($(date -u)) ==="
bash scripts/r4b_slot2.sh "$SLOT2_END" > /tmp/r4b_slot2.log 2>&1
echo "=== master: slot 2 done, starting tail ($(date -u)) ==="
bash scripts/r4b_tail.sh "$TAIL_END" > /tmp/r4b_tail.log 2>&1
echo "=== master: all done ($(date -u)) ==="
