#!/bin/bash
# 07:45 UTC Aug 20: supersede chain5 the moment its confined training child
# exits — kills the chain shell + its committer (NEVER the training child),
# so the r5_post watcher takes over immediately.  Rationale: chain5 would
# spend a ~25-min remote compile on a 40-min semi slot and push the
# confined bar crossing to ~10:45; r5_post (with the tail folded in) lands
# the bar ~2h earlier and gives semi one long compile-amortized slot.
#   bash scripts/r5_supersede.sh TRAIN_PID CHAIN_PID COMMITTER_PID
set -u
TRAIN_PID=${1:?confined training child pid}
CHAIN_PID=${2:?chain5 shell pid}
COMM_PID=${3:?chain5 committer pid}
while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 2; done
sleep 3   # let run_slot's post-child git commit finish
kill "$CHAIN_PID" 2>/dev/null
kill "$COMM_PID" 2>/dev/null
echo "chain5 superseded at $(date -u)"
