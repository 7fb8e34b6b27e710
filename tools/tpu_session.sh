#!/bin/bash
# One-command TPU validation session (run when the axon tunnel is healthy).
#
# Reproduces the round-2 evidence chain end-to-end and adds the round-3
# DPM-Solver++ gates + benchmark:
#   1. train the full-dim synthetic-corpus recipe to 110k steps
#      (diff_start=70000 per the eps-head lr rule; --supervise restarts
#      through the tunnel's host-RSS leak, docs/OPS.md)
#   2. mel-domain diffusion-vs-coarse comparison
#   3. fast-sampler quality gates: PLMS-5, strided-F0, DPM++ 10-NFE
#   4. full benchmark table (incl. e2e_rtf_dpm)
#
# Usage: bash tools/tpu_session.sh [work-root=data/validation] [steps=110000]
set -euo pipefail
cd "$(dirname "$0")/.."

DIR="${1:-data/validation}"
STEPS="${2:-110000}"
OV="diff_start=70000,max_updates=${STEPS}"

echo "== 0. tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "TPU backend unavailable; aborting"; exit 75; }

echo "== 1. train to ${STEPS} (resumes from any existing checkpoint)"
# restart-and-resume through the tunnel's host-RSS leak: the auto-armed
# watchdog checkpoints and exits 75 (EX_TEMPFAIL) before the kernel OOM
# killer can corrupt a save; the loop is this script's --supervise
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

echo "== 2. diffusion vs coarse decoder (mel domain)"
python tools/compare_diff_coarse.py --dir "$DIR" --steps "$STEPS"

echo "== 3. fast-sampler quality gates (incl. dpm10)"
python tools/eval_fast_samplers.py --dir "$DIR" --steps "$STEPS" \
  --overrides "$OV"

echo "== 4. benchmarks"
python bench_all.py

echo "== done — see $DIR/work/fast_sampler_gates.json and STATUS.md"
