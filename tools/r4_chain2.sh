#!/bin/bash
# Round-4 stage 2 chain (session-restart continuation of
# tools/r4_post_acoustic.sh): the 320k acoustic run is complete and the
# post-run bench already produced results/bench_r4_chain.json, but the
# original chain was parked in its wait-for-BENCH_r04 loop (the round
# did not end — the session restarted). This continuation skips the
# bench/yield stages and runs the remaining evidence now:
#   diffusion-vs-coarse -> fast-sampler gates (incl. DPM-10) -> collect
#   -> 100k vocoder GAN run (stall-watchdog supervised) -> e2e with the
#   trained pairing -> collect
#
# Usage: bash tools/r4_chain2.sh [dir=data/r4full] [steps=320000]
#        [vdir=data/validation] [vsteps=100000]
set -uo pipefail
cd "$(dirname "$0")/.."

DIR="${1:-data/r4full}"
STEPS="${2:-320000}"
VDIR="${3:-data/validation}"
VSTEPS="${4:-100000}"
OV="forcing=20000,rq_start=20500,diff_start=100000,warmup_updates=8000"
OV="$OV,val_check_interval=5000,max_updates=${STEPS},steps_per_dispatch=50"

VLOG=/tmp/r4_vocoder.log
VPID=/tmp/r4_vocoder.pid
WPID=/tmp/r4_vocoder_watchdog.pid
VDONE="== done (run validate_e2e"
VFAIL="vocoder training failed with rc="

echo "== diffusion vs coarse (mel domain)"
timeout 3600 python tools/compare_diff_coarse.py --dir "$DIR" \
  --steps "$STEPS" || true

echo "== fast-sampler gates (exact / PLMS-5 / f0fast-5 / DPM-10)"
timeout 7200 python tools/eval_fast_samplers.py --dir "$DIR" \
  --steps "$STEPS" --overrides "$OV" || true

python tools/collect_results.py --dir "$DIR" --tag acoustic_320k

echo "== vocoder ${VSTEPS}-step GAN run (watchdog-supervised)"
launch_vocoder() {
  nohup bash tools/r4_vocoder.sh "$VSTEPS" "$VDIR" >> "$VLOG" 2>&1 &
  echo $! > "$VPID"
}
launch_watchdog() {
  DONE_RE="$VDONE" FAIL_RE="$VFAIL" \
    RESTART_CMD="bash tools/r4_vocoder.sh $VSTEPS $VDIR" \
    nohup bash tools/stall_watchdog.sh "$VLOG" "$VPID" "$VLOG" \
    "$VSTEPS" "$VDIR" 900 >> /tmp/r4_vocoder_watchdog.log 2>&1 &
  echo $! > "$WPID"
}
launch_vocoder
launch_watchdog

# Poll for completion. Relaunch ONLY when both the wrapper and the
# watchdog are dead across two polls 90s apart (the watchdog's own
# kill-and-restart window briefly shows a dead wrapper pid; racing it
# would put two trainers on the single-client tunnel and clobber the
# GAN snapshot).
dead_polls=0
for i in $(seq 1 1440); do
  grep -q "$VDONE" "$VLOG" 2>/dev/null && break
  if grep -q "$VFAIL" "$VLOG" 2>/dev/null; then
    echo "vocoder run failed deterministically; aborting chain"; exit 1
  fi
  vp=$(cat "$VPID" 2>/dev/null || echo 0)
  wp=$(cat "$WPID" 2>/dev/null || echo 0)
  if ! kill -0 "$vp" 2>/dev/null && ! kill -0 "$wp" 2>/dev/null; then
    dead_polls=$((dead_polls + 1))
    if [ "$dead_polls" -ge 2 ]; then
      echo "== wrapper+watchdog dead without done marker; relaunching"
      dead_polls=0
      launch_vocoder
      launch_watchdog
    fi
  else
    dead_polls=0
  fi
  sleep 90
done
grep -q "$VDONE" "$VLOG" || {
  echo "timed out waiting for the vocoder run"; exit 1; }

echo "== e2e: ${STEPS} acoustic + ${VSTEPS} vocoder"
# repoint a stale/broken symlink from any previous run (a silently-kept
# old link would score the acoustic model against the wrong vocoder);
# only a REAL directory (an in-dir vocoder run) is kept as-is
if [ -L "$DIR/work_vocoder" ] || [ ! -e "$DIR/work_vocoder" ]; then
  ln -sfn "$(cd "$VDIR" && pwd)/work_vocoder" "$DIR/work_vocoder"
fi
timeout 3600 python tools/validate_e2e.py --dir "$DIR" \
  --steps "$STEPS" || true
python tools/collect_results.py --dir "$VDIR" --tag vocoder_100k || true
python tools/collect_results.py --dir "$DIR" --tag acoustic_320k || true

echo "== r4 evidence chain (stage 2) done"
