#!/bin/bash
# Round-4 stage 3 chain (second session-restart continuation of
# tools/r4_chain2.sh): diff-vs-coarse, sampler gates, and the
# acoustic_320k collect are already done; the 100k vocoder GAN run was
# killed with the session at ~38k steps (snapshot at 35k). This chain
# resumes the vocoder run and then finishes the round-4 evidence:
#   vocoder resume -> e2e with the trained pairing -> collect both dirs
#
# Launch DETACHED (setsid) so the next session restart cannot kill it:
#   setsid nohup bash tools/r4_chain3.sh > /tmp/r4_chain3.log 2>&1 &
# The chain is the session leader; its children below are plain nohup —
# adding setsid to THEM forks (setsid(2) fails for a group leader, so
# util-linux setsid forks first) and $! then records the short-lived
# parent, leaving a stale pidfile that makes the poll loop spuriously
# relaunch a second trainer onto the single-client tunnel (observed
# 2026-08-20: duplicate validate_vocoder processes).
#
# Usage: bash tools/r4_chain3.sh [dir=data/r4full] [steps=320000]
#        [vdir=data/validation] [vsteps=100000]
set -uo pipefail
cd "$(dirname "$0")/.."

DIR="${1:-data/r4full}"
STEPS="${2:-320000}"
VDIR="${3:-data/validation}"
VSTEPS="${4:-100000}"

VLOG=/tmp/r4_vocoder.log
VPID=/tmp/r4_vocoder.pid
WPID=/tmp/r4_vocoder_watchdog.pid
VDONE="== done (run validate_e2e"
VFAIL="vocoder training failed with rc="

echo "== vocoder ${VSTEPS}-step GAN run (resume, watchdog-supervised)"
launch_vocoder() {
  nohup bash tools/r4_vocoder.sh "$VSTEPS" "$VDIR" >> "$VLOG" 2>&1 &
  echo $! > "$VPID"
}
launch_watchdog() {
  # 2400 s staleness window, NOT 900: a watchdog-restarted run is
  # silent for snapshot-load + cold GAN-scan compile (~9+ min); a 900 s
  # window re-kills it mid-compile and loops (docs/OPS.md sizing note;
  # observed once on 2026-08-20 at the first resume).
  DONE_RE="$VDONE" FAIL_RE="$VFAIL" \
    RESTART_CMD="bash tools/r4_vocoder.sh $VSTEPS $VDIR" \
    nohup bash tools/stall_watchdog.sh "$VLOG" "$VPID" "$VLOG" \
    "$VSTEPS" "$VDIR" 2400 >> /tmp/r4_vocoder_watchdog.log 2>&1 &
  echo $! > "$WPID"
}
launch_vocoder
launch_watchdog

# Poll for completion; relaunch only after two consecutive dead polls
# (see r4_chain2.sh for the race rationale).
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
if [ -L "$DIR/work_vocoder" ] || [ ! -e "$DIR/work_vocoder" ]; then
  ln -sfn "$(cd "$VDIR" && pwd)/work_vocoder" "$DIR/work_vocoder"
fi
timeout 3600 python tools/validate_e2e.py --dir "$DIR" \
  --steps "$STEPS" || true
python tools/collect_results.py --dir "$VDIR" --tag vocoder_100k || true
python tools/collect_results.py --dir "$DIR" --tag acoustic_320k || true

echo "== r4 evidence chain (stage 3) done"
