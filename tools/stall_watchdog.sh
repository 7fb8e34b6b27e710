#!/bin/bash
# Babysit a long TPU training run driven by tools/r4_train_acoustic.sh:
# a remote-PJRT RPC can wedge forever (process alive, futex-wait, no
# metrics progress) when the tunnel connection drops — the in-script
# restart loop only handles processes that EXIT. This watchdog restarts
# the run when the metrics file goes stale while the trainer is alive.
#
# Kill order matters: the WRAPPER first (so its rc!=75 fatal branch never
# prints "training failed with rc=" into the log the evidence chain
# greps), then the python child. PID-file based — never kills by pattern.
#
# Usage: bash tools/stall_watchdog.sh [log=/tmp/r4_acoustic.log]
#   [pidfile=/tmp/r4_acoustic.pid] [metrics=data/r4full/work/metrics.jsonl]
#   [steps=320000] [dir=data/r4full] [stale_s=900]
#
# Env overrides generalize it to any wrapped run (e.g. the vocoder GAN
# stage, whose heartbeat is its own log file):
#   DONE_RE / FAIL_RE  - completion / fatal-failure markers grepped in LOG
#   RESTART_CMD        - command restarted on staleness (>> LOG, pid ->
#                        PIDFILE)
set -u
cd "$(dirname "$0")/.."

LOG="${1:-/tmp/r4_acoustic.log}"
PIDFILE="${2:-/tmp/r4_acoustic.pid}"
METRICS="${3:-data/r4full/work/metrics.jsonl}"
STEPS="${4:-320000}"
DIR="${5:-data/r4full}"
STALE="${6:-900}"
DONE_RE="${DONE_RE:-acoustic ${STEPS}-step run complete}"
FAIL_RE="${FAIL_RE:-training failed with rc=}"
RESTART_CMD="${RESTART_CMD:-bash tools/r4_train_acoustic.sh $STEPS $DIR}"

while true; do
  sleep 120
  grep -q "$DONE_RE" "$LOG" 2>/dev/null && exit 0
  grep -q "$FAIL_RE" "$LOG" 2>/dev/null && exit 1
  pid=$(cat "$PIDFILE" 2>/dev/null) || continue
  kill -0 "$pid" 2>/dev/null || exit 0  # wrapper exited; its loop/chain owns it
  [ -f "$METRICS" ] || continue
  age=$(( $(date +%s) - $(stat -c %Y "$METRICS") ))
  if [ "$age" -gt "$STALE" ]; then
    echo "== stall_watchdog: metrics stale ${age}s; restarting run" >> "$LOG"
    # freeze the wrapper FIRST so it cannot spawn a fresh python between
    # the child snapshot and the kill (an orphaned second trainer would
    # clobber checkpoints and contend for the single-client tunnel)
    kill -STOP "$pid" 2>/dev/null
    children=$(ps -o pid= --ppid "$pid")
    kill -9 "$pid" 2>/dev/null
    sleep 1
    for c in $children; do
      kill -9 "$c" 2>/dev/null
      # python may be a grandchild (under `timeout`): sweep one level down
      for g in $(ps -o pid= --ppid "$c" 2>/dev/null); do
        kill -9 "$g" 2>/dev/null
      done
    done
    sleep 3
    nohup $RESTART_CMD >> "$LOG" 2>&1 &
    echo $! > "$PIDFILE"
    # reset the staleness clock: the restart's first metrics write can be
    # a full cold compile away; without this the old mtime re-triggers a
    # kill-loop every cycle
    touch "$METRICS" 2>/dev/null
    sleep 300  # give the restart time to compile before re-checking
  fi
done
