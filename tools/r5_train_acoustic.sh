#!/bin/bash
# Round-5 stage 1: the FULL reference recipe (320k steps, flagship dims,
# reference curriculum — see tools/r4_train_acoustic.sh) PLUS permanent
# milestone snapshots every 20k steps (cfg milestone_interval) so the
# post-run quality sweep (tools/sweep_milestones.py) can locate where
# zero-shot FFE peaks over training (VERDICT r4 weak #3).
#
# Usage: bash tools/r5_train_acoustic.sh [steps=320000] [dir=data/r5full]
set -uo pipefail
cd "$(dirname "$0")/.."

STEPS="${1:-320000}"
DIR="${2:-data/r5full}"
OV="forcing=20000,rq_start=20500,diff_start=100000,warmup_updates=8000"
OV="$OV,val_check_interval=5000,max_updates=${STEPS}"
OV="$OV,steps_per_dispatch=50,milestone_interval=20000"

echo "== tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "TPU backend unavailable; aborting"; exit 75; }

rc=1
for attempt in $(seq 1 300); do
  rc=0
  python tools/validate_training.py --dir "$DIR" --steps "$STEPS" \
    --overrides "$OV" || rc=$?
  if [ "$rc" -eq 0 ]; then break; fi
  if [ "$rc" -ne 75 ]; then
    echo "training failed with rc=$rc"; exit "$rc"
  fi
  echo "== watchdog checkpoint (restart $attempt); resuming"
done
if [ "$rc" -ne 0 ]; then
  echo "training never completed after 300 restarts"; exit 75
fi
echo "== acoustic ${STEPS}-step run complete"
