#!/bin/bash
# Round-3 TPU evidence chain, compressed to fit one session.
#
# Reproduces the round-2 diffusion proof at the SAME eps-head operating
# point but in 50k steps instead of 110k: lr is scaled 0.65x so that
# lr(diff_start=30000) = 4.7e-4 — exactly the lr at which the round-2
# run's eps head (diff_start=70000, lr=2.0) trained successfully
# (see training/schedules.py::DIFF_HEAD_MAX_LR and STATUS.md round 2).
# The eps head gets 20k training steps (round 2 harvested 40k of the
# reference's 120k budget).
#
# Usage: bash tools/r3_session.sh [work-root=data/validation] [steps=50000]
set -uo pipefail
cd "$(dirname "$0")/.."

DIR="${1:-data/validation}"
STEPS="${2:-50000}"
OV="diff_start=30000,lr=1.3,max_updates=${STEPS}"

echo "== 1. train to ${STEPS} (resumes from any existing checkpoint)"
for attempt in $(seq 1 200); do
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
  echo "training never completed after 200 restarts"; exit "$rc"
fi

echo "== 2. diffusion vs coarse decoder (mel domain)"
python tools/compare_diff_coarse.py --dir "$DIR" --steps "$STEPS" || true

echo "== 3. fast-sampler quality gates (incl. dpm10)"
python tools/eval_fast_samplers.py --dir "$DIR" --steps "$STEPS" \
  --overrides "$OV" || true

echo "== done — see $DIR/work/fast_sampler_gates.json"
