#!/bin/bash
# Timed TPU training session: train the full-dim synthetic-corpus recipe in
# the background with the supervise loop (restart-and-resume across the
# tunnel's exit-75 host-RSS watchdog), writing the live python PID to
# /tmp/train.pid so a timed session can stop it gracefully:
#
#   kill -INT $(cat /tmp/train.pid)   # Ctrl-C save: checkpoint at current step
#
# Usage: bash tools/session_train.sh [work-root=data/validation] [steps=110000]
#        [overrides=diff_start=55000,val_check_interval=5000]
set -uo pipefail
cd "$(dirname "$0")/.."

DIR="${1:-data/validation}"
STEPS="${2:-110000}"
OV="${3:-diff_start=55000,val_check_interval=5000,max_updates=${STEPS}}"

for attempt in $(seq 1 200); do
  python tools/validate_training.py --dir "$DIR" --steps "$STEPS" \
    --overrides "$OV" &
  echo $! > /tmp/train.pid
  wait $!
  rc=$?
  rm -f /tmp/train.pid
  if [ "$rc" -eq 0 ]; then break; fi
  if [ "$rc" -ne 75 ]; then
    echo "training failed with rc=$rc"; exit "$rc"
  fi
  echo "== watchdog checkpoint (restart $attempt); resuming"
done
echo "== session_train done rc=$rc"
