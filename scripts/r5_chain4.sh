#!/bin/bash
# r5 chain, take 4 (03:00 UTC Aug 20): the 20:40 chain died in the third VM
# restart (00:20 UTC) and the chip/tunnel entered an outage (probe hung
# >5 min at 02:55).  r3_queue5 pattern: Phase 0 probes backend init in a
# loop and only starts the clock at chip-up, dividing the REAL chip window —
# not outage time — between the remaining slots:
#   confined (1.6648e-4 -> bar 3.8e-5)  55% of main window
#   semi     (4.609e-4  -> bar 2.7e-5)  45% of main window
#   tail     (MFU, steprate, idle bench, ablation)  capped 4200s
#   closer   (case nearest its bar, r5_closer.sh)   remainder to HARD_END
# Kills the CPU outage queue (scripts/r5_cpu_outage.sh) on chip-up — the
# 1-core host serializes everything.
#
#   bash scripts/r5_chain4.sh HARD_END_EPOCH
set -u
cd /root/repo
HARD_END=${1:?epoch seconds hard stop for ALL chip work}
left () { echo $(( HARD_END - $(date +%s) )); }

# ---- Phase 0: wait for the chip -------------------------------------------
while [ "$(left)" -gt 900 ]; do
  echo "=== probe backend init ($(left)s to hard end, $(date -u)) ==="
  timeout 1800 python -c "import jax; print(jax.devices())" && break
  echo "probe failed rc=$?"
  sleep 30
done
if [ "$(left)" -le 900 ]; then
  echo "=== chip never came back; chain4 exiting ($(date -u)) ==="
  exit 1
fi
echo "=== CHIP UP at $(date -u), window $(left)s ==="
touch /tmp/tpu_up
if [ -f /tmp/r5cpu.pid ]; then
  kill "$(cat /tmp/r5cpu.pid)" 2>/dev/null && echo "killed CPU outage queue"
  sleep 5
fi

W=$(left)
TAIL_BUDGET=$(( W * 22 / 100 )); [ "$TAIL_BUDGET" -gt 4200 ] && TAIL_BUDGET=4200
CLOSER_BUDGET=$(( W * 12 / 100 )); [ "$CLOSER_BUDGET" -gt 2700 ] && CLOSER_BUDGET=2700
MAIN=$(( W - TAIL_BUDGET - CLOSER_BUDGET ))
CONF_END=$(( $(date +%s) + MAIN * 55 / 100 ))
SEMI_END=$(( $(date +%s) + MAIN ))
TAIL_END=$(( SEMI_END + TAIL_BUDGET ))
echo "window W=$W  conf->$CONF_END  semi->$SEMI_END  tail->$TAIL_END  closer->$HARD_END"

bash scripts/r5_main2.sh "$CONF_END" "$SEMI_END"
bash scripts/r5_tail.sh "$TAIL_END"
bash scripts/r5_closer.sh "$HARD_END"
echo "=== r5 chain4 done ($(date -u)) ==="
