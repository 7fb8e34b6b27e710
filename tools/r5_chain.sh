#!/bin/bash
# Round-5 evidence chain (runs after tools/r5_train_acoustic.sh):
#   wait for the 320k acoustic run -> milestone FFE sweep (VERDICT r4
#   weak #3) -> collect acoustic artifacts -> warming bench + tracked
#   compile-cache seed (weak #1) -> vocoder GAN run to 100k steps or the
#   TPU budget, whichever first (weak #2) -> vocoder validation -> e2e
#   with BOTH the final checkpoint and the best-FFE milestone -> collect.
#
# The chain frees the chip unconditionally at R5_TPU_BUDGET_S seconds
# after ITS OWN START so the driver's end-of-round bench never finds the
# tunnel held (r4 postmortem: the vocoder run was still on the chip at
# bench time).
#
# Launch DETACHED so a session restart cannot kill it:
#   setsid nohup bash tools/r5_chain.sh > /tmp/r5_chain.log 2>&1 &
#
# Usage: bash tools/r5_chain.sh [dir=data/r5full] [steps=320000]
#        [vsteps=100000]
set -uo pipefail
cd "$(dirname "$0")/.."

DIR="${1:-data/r5full}"
STEPS="${2:-320000}"
VSTEPS="${3:-100000}"
BUDGET="${R5_TPU_BUDGET_S:-28800}"   # 8h of chip time for this chain
RESERVE="${R5_RESERVE_S:-4200}"      # e2e x2 + vocoder eval + collects
T0=$(date +%s)
left() { echo $(( BUDGET - ($(date +%s) - T0) )); }

ALOG=/tmp/r5_acoustic.log
VLOG=/tmp/r5_vocoder.log
VPID=/tmp/r5_vocoder.pid
WPID=/tmp/r5_vocoder_watchdog.pid
VDONE="== done (run validate_e2e"
VFAIL="vocoder training failed with rc="

echo "== waiting for the acoustic run completion marker in $ALOG"
for i in $(seq 1 2000); do
  grep -q "acoustic ${STEPS}-step run complete" "$ALOG" 2>/dev/null && break
  if grep -q "training failed with rc=" "$ALOG" 2>/dev/null; then
    echo "acoustic run FAILED; aborting chain"; exit 1
  fi
  sleep 30
done
grep -q "acoustic ${STEPS}-step run complete" "$ALOG" || {
  echo "timed out waiting for the acoustic run"; exit 1; }

echo "== milestone FFE sweep (fast samplers, quality-equivalent per"
echo "== results/acoustic_320k_fast_sampler_gates.json)"
timeout 7200 python tools/sweep_milestones.py --dir "$DIR" \
  --steps "$STEPS" --overrides "f0_speedup=5,dpm_steps=10" || true

python tools/collect_results.py --dir "$DIR" --tag acoustic_r5_320k || true

echo "== warming bench (also the tracked TPU bench artifact) + cache seed"
if BENCH_DEADLINE_S=5400 timeout 5700 python bench.py \
    > /tmp/r5_bench_chain.json 2>> /tmp/r5_bench_chain.err; then
  python - <<'EOF' || true
import json, subprocess, time
row = json.loads(open("/tmp/r5_bench_chain.json").read().strip().splitlines()[-1])
row["provenance"] = {
    "when": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
    "git": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip(),
    "context": "r5 evidence chain, after the 320k acoustic run",
}
open("results/bench_r5_chain.json", "w").write(json.dumps(row, indent=1))
print("| results/bench_r5_chain.json:", row.get("value"), row.get("backend"))
EOF
else
  echo "chain bench failed/timed out (see /tmp/r5_bench_chain.err)"
fi
python tools/build_cache_seed.py || true

echo "== vocoder GAN run (target ${VSTEPS}; budget $(left)s)"
launch_vocoder() {
  nohup bash tools/r4_vocoder.sh "$VSTEPS" "$DIR" >> "$VLOG" 2>&1 &
  echo $! > "$VPID"
}
launch_watchdog() {
  DONE_RE="$VDONE" FAIL_RE="$VFAIL" \
    RESTART_CMD="bash tools/r4_vocoder.sh $VSTEPS $DIR" \
    nohup bash tools/stall_watchdog.sh "$VLOG" "$VPID" "$VLOG" \
    "$VSTEPS" "$DIR" 2400 >> /tmp/r5_vocoder_watchdog.log 2>&1 &
  echo $! > "$WPID"
}
stop_vocoder() {
  # pidfile-based, never by pattern; wrapper first (its fatal branch
  # must not fire), then its children
  for pf in "$WPID" "$VPID"; do
    p=$(cat "$pf" 2>/dev/null) || continue
    kill -STOP "$p" 2>/dev/null
    kids=$(ps -o pid= --ppid "$p" 2>/dev/null)
    kill -9 "$p" 2>/dev/null
    for k in $kids; do
      gk=$(ps -o pid= --ppid "$k" 2>/dev/null)
      kill -9 "$k" 2>/dev/null
      for g in $gk; do kill -9 "$g" 2>/dev/null; done
    done
  done
  sleep 5
}
: > "$VLOG"
launch_vocoder
launch_watchdog

dead_polls=0
while true; do
  grep -q "$VDONE" "$VLOG" 2>/dev/null && { VOC_RC=done; break; }
  if grep -q "$VFAIL" "$VLOG" 2>/dev/null; then
    echo "vocoder run failed deterministically"; VOC_RC=fail; break
  fi
  if [ "$(left)" -le "$RESERVE" ]; then
    echo "== TPU budget reached ($(left)s left, reserve ${RESERVE}s):"
    echo "== stopping the vocoder run at its last 5k snapshot"
    stop_vocoder
    VOC_RC=budget
    break
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

VREACHED="$VSTEPS"
if [ "$VOC_RC" = budget ]; then
  # validate at the last 5k-snapshot step (validate_vocoder resumes the
  # snapshot, sees step>=target, skips training and evaluates)
  last=$(grep -o "| step [0-9]*" "$VLOG" | tail -1 | grep -o "[0-9]*")
  VREACHED=$(( (last / 5000) * 5000 ))
  if [ "$VREACHED" -lt 5000 ]; then
    echo "vocoder reached <5000 steps; skipping vocoder/e2e evals"
    exit 1
  fi
  echo "== vocoder eval at snapshot step ${VREACHED}"
  timeout 3600 python tools/validate_vocoder.py --dir "$DIR" \
    --steps "$VREACHED" --spd 50 || true
elif [ "$VOC_RC" = fail ]; then
  echo "== attempting vocoder eval at the last snapshot anyway"
  last=$(grep -o "| step [0-9]*" "$VLOG" | tail -1 | grep -o "[0-9]*")
  VREACHED=$(( (last / 5000) * 5000 ))
  timeout 3600 python tools/validate_vocoder.py --dir "$DIR" \
    --steps "$VREACHED" --spd 50 || true
fi

echo "== e2e: ${STEPS} acoustic (final ckpt) + ${VREACHED}-step vocoder"
timeout 3600 python tools/validate_e2e.py --dir "$DIR" \
  --steps "$STEPS" || true
python tools/collect_results.py --dir "$DIR" --tag acoustic_r5_320k || true
python tools/collect_results.py --dir "$DIR" \
  --tag "vocoder_r5_${VREACHED}" || true

export R5DIR="$DIR"
BEST=$(python - <<'EOF'
import json, os, sys
try:
    d = json.load(open(os.path.join(os.environ["R5DIR"], "work",
                                    "milestone_sweep.json")))
    print(d["best_ffe_step"])
except Exception:
    print(0)
EOF
)
if [ -n "$BEST" ] && [ "$BEST" != 0 ] && [ "$BEST" != "$STEPS" ]; then
  echo "== e2e with the best-FFE milestone (step $BEST)"
  timeout 3600 python tools/validate_e2e.py --dir "$DIR" \
    --steps "$STEPS" --milestone "$BEST" || true
  python tools/collect_results.py --dir "$DIR" \
    --tag "acoustic_r5_best${BEST}" || true
fi

echo "== r5 evidence chain done ($(left)s of budget left; chip freed)"
