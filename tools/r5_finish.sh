#!/bin/bash
# Round-5 finish: after the extended vocoder GAN run (tools/r4_vocoder.sh
# 100000 data/r5full, log /tmp/r5_vocoder2.log) completes, run the final
# wav-domain e2e (320k acoustic + the trained vocoder) and collect the
# artifacts under the vocoder_r5_<steps> tag.
#
# Launch DETACHED: setsid nohup bash tools/r5_finish.sh \
#   > /tmp/r5_finish.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

DIR="${1:-data/r5full}"
VLOG="${2:-/tmp/r5_vocoder2.log}"

echo "== waiting for the vocoder run completion marker"
for i in $(seq 1 400); do
  grep -q "== done (run validate_e2e" "$VLOG" 2>/dev/null && break
  if grep -q "vocoder training failed with rc=" "$VLOG" 2>/dev/null; then
    echo "vocoder run failed; evaluating the last snapshot instead"
    break
  fi
  sleep 30
done

last=$(grep -o "| step [0-9]*" "$VLOG" | tail -1 | grep -o "[0-9]*")
REACHED=$(( (last / 5000) * 5000 ))
if grep -q "== done (run validate_e2e" "$VLOG"; then
  REACHED=100000
else
  echo "== vocoder stopped early; eval at snapshot step ${REACHED}"
  timeout 3600 python tools/validate_vocoder.py --dir "$DIR" \
    --steps "$REACHED" --spd 50 || true
fi

echo "== e2e: 320k acoustic + ${REACHED}-step vocoder"
timeout 3600 python tools/validate_e2e.py --dir "$DIR" --steps 320000 \
  || true
python tools/collect_results.py --dir "$DIR" \
  --tag "vocoder_r5_${REACHED}" || true

echo "== r5 finish done (chip free)"
