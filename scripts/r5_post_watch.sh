#!/bin/bash
# Waits for the chain5 shell to exit, then launches r5_post.sh.
#   setsid bash scripts/r5_post_watch.sh CHAIN_PID SEMI_END HARD_END
set -u
cd /root/repo
CHAIN_PID=${1:?chain5 shell pid (0 = none)}
while [ "$CHAIN_PID" != 0 ] && kill -0 "$CHAIN_PID" 2>/dev/null; do
  sleep 60
done
exec bash scripts/r5_post.sh "$2" "$3"
