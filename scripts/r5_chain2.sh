#!/bin/bash
# r5 chain, revision 2: main queue rev 2 (confined w/ freeze-B, then semi)
# followed by the unchanged tail.  Launched after the plate slot hit its
# bar early and the plain confined slot was stopped for re-flagging.
set -u
cd /root/repo

bash scripts/r5_main2.sh "${1:-1787177400}" "${2:-1787183700}"
bash scripts/r5_tail.sh "${3:-1787191200}"
echo "=== r5 chain (rev 2) done ($(date -u)) ==="
