#!/bin/bash
# Round-4 stage 1: the FULL reference recipe on the TPU — 320k steps at
# flagship dims with the reference's own curriculum breakpoints
# (forcing=20k, rq_start=20.5k, diff_start=100k, warmup 8k of
# max_updates=320k; /root/reference/egs/stylesinger.yaml:100,106,109,133 and
# egs/egs_bases/tts/base.yaml:82-88). Restarts through the tunnel's
# host-RSS leak on exit 75 (docs/OPS.md).
#
# Usage: bash tools/r4_train_acoustic.sh [steps=320000] [dir=data/validation]
set -uo pipefail
cd "$(dirname "$0")/.."

STEPS="${1:-320000}"
DIR="${2:-data/validation}"
OV="forcing=20000,rq_start=20500,diff_start=100000,warmup_updates=8000"
OV="$OV,val_check_interval=5000,max_updates=${STEPS}"
# multi-step dispatch: 50 optimizer steps per device program (window is
# clipped to log/val boundaries and curriculum flips automatically)
OV="$OV,steps_per_dispatch=50"

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
# ADVICE r3: never fall through the restart loop as if training succeeded
if [ "$rc" -ne 0 ]; then
  echo "training never completed after 300 restarts"; exit 75
fi
echo "== acoustic ${STEPS}-step run complete"
