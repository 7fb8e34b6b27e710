#!/bin/bash
# Round-4 stage 2: train the NSF vocoder past the quality floor
# (VERDICT r3 weak #2): >=100k GAN steps with the on-device scan
# dispatcher (--spd), then re-run the e2e validation with the trained
# vocoder. Resume-safe: gan_state.msgpack snapshots every 5k steps.
#
# Usage: bash tools/r4_vocoder.sh [steps=100000] [dir=data/validation]
set -uo pipefail
cd "$(dirname "$0")/.."

STEPS="${1:-100000}"
DIR="${2:-data/validation}"

echo "== tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "TPU backend unavailable; aborting"; exit 75; }

rc=1
for attempt in $(seq 1 100); do
  rc=0
  timeout 21600 python tools/validate_vocoder.py --dir "$DIR" \
    --steps "$STEPS" --spd 50 || rc=$?
  if [ "$rc" -eq 0 ]; then break; fi
  # resume only the recoverable exits: 75 (RSS watchdog checkpoint+exit)
  # and 124 (wall-clock timeout above). A deterministic failure must be
  # fatal, not retried 100 times (ADVICE r3 fall-through lesson).
  if [ "$rc" -ne 75 ] && [ "$rc" -ne 124 ]; then
    echo "vocoder training failed with rc=$rc"; exit "$rc"
  fi
  echo "== vocoder run interrupted rc=$rc (restart $attempt); resuming"
done
if [ "$rc" -ne 0 ]; then
  echo "vocoder training never completed"; exit 75
fi

echo "== done (run validate_e2e from the chain with the acoustic run dir)"
