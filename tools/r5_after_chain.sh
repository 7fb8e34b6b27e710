#!/bin/bash
# Round-5 stage 3: after the evidence chain frees the chip, finish the
# head-to-head (VERDICT r4 next #3): train THIS framework at the same
# matched-reduced config the reference-torch run used (identical data,
# steps, batch, curriculum, metrics), then combine the two validations
# into results/ref_vs_tpu_quality.json. Also refreshes the tracked
# compile-cache seed so it carries every bench entry.
#
# Launch DETACHED: setsid nohup bash tools/r5_after_chain.sh \
#   > /tmp/r5_after_chain.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

DIR="${1:-data/r5full}"

echo "== waiting for the evidence chain to free the chip"
for i in $(seq 1 700); do
  grep -q "r5 evidence chain done" /tmp/r5_chain.log 2>/dev/null && break
  sleep 60
done
grep -q "r5 evidence chain done" /tmp/r5_chain.log || {
  echo "chain never finished; not touching the chip"; exit 1; }

echo "== tunnel probe"
timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "TPU unavailable"; exit 75; }

echo "== head-to-head: this framework at the matched config"
rc=1
for attempt in 1 2 3; do
  rc=0
  timeout 7200 python tools/ref_headtohead.py --impl tpu --dir "$DIR" \
    || rc=$?
  [ "$rc" -eq 0 ] && break
  # 75 = RSS watchdog (resume-safe); anything else is fatal
  [ "$rc" -ne 75 ] && { echo "tpu head-to-head failed rc=$rc"; break; }
done

echo "== waiting for the reference-torch run (if still training)"
for i in $(seq 1 360); do
  [ -f "$DIR/work_ref_hh/validation.json" ] && break
  grep -q "Error\|Traceback" /tmp/r5_ref_hh.log 2>/dev/null && break
  sleep 60
done

echo "== combine"
python tools/ref_headtohead.py --combine --dir "$DIR" || true

echo "== refresh the tracked compile-cache seed"
python tools/build_cache_seed.py || true

echo "== r5 stage 3 done (chip free)"
