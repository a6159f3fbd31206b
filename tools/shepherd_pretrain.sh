#!/bin/bash
# Shepherd the wav2vec2 plateau run (tools/run_pretrain.sh) to max_epoch
# across timeout kills, tunnel drops AND silent tunnel hangs, under one
# ABSOLUTE wall-clock deadline so nothing can run into the round boundary
# and poison the driver's bench capture (VERDICT r3 "what's weak" #1).
#
# Stall detection: the remote-execution tunnel can hang a dispatch forever
# (main thread futex-parked on the axon remote loop, tokio worker in
# epoll — observed twice on 2026-08-19, neither self-healed). In steady
# state the trainer logs every ~15-30 s, so a silent train.log means a
# hung tunnel, not slow work. Startup (data load + resume + compile) is
# legitimately silent for up to ~20 min, so the threshold depends on
# whether the last log line is a steady-state report.
#
# Usage: DEADLINE="2026-08-20 04:10" tools/shepherd_pretrain.sh [run_dir] [epochs]
set -u
cd "$(dirname "$0")/.."
REPO="$PWD"
RUN="${1:-$REPO/exp/pretrain_run4}"
EPOCHS="${2:-36}"
mkdir -p "$RUN"  # the launcher.log redirect below needs it BEFORE run_pretrain's own mkdir
DEADLINE_S=$(date -d "${DEADLINE:?set DEADLINE, e.g. 2026-08-20 04:10}" +%s)
STALL_STEADY_S=${STALL_STEADY_S:-600}    # silent this long after a report => hung
STALL_STARTUP_S=${STALL_STARTUP_S:-1800} # startup (load/resume/compile) allowance
LOG=/tmp/shepherd.log
stamp() { date "+%F %T"; }
meta_epoch() {
  python - "$RUN/ckpts/train_state.msgpack.meta" <<'EOF' 2>/dev/null || echo -1
import json, sys
print(json.load(open(sys.argv[1]))["epoch"])
EOF
}
stall_limit() {  # steady-state iff the last train.log line is a trainer report
  if tail -1 "$RUN/train.log" 2>/dev/null | grep -q "report_loss\|\[valid\]"; then
    echo "$STALL_STEADY_S"
  else
    echo "$STALL_STARTUP_S"
  fi
}
log_age() {
  local m
  m=$(stat -c %Y "$RUN/train.log" 2>/dev/null || echo 0)
  echo $(( $(date +%s) - m ))
}
kill_pid() {  # TERM the launcher (timeout forwards it), escalate to KILL
  kill "$1" 2>/dev/null
  for _ in $(seq 1 24); do kill -0 "$1" 2>/dev/null || return 0; sleep 5; done
  kill -9 "$1" 2>/dev/null; sleep 5
}

echo "$(stamp) shepherd start: run=$RUN target=$EPOCHS deadline=$DEADLINE" >> "$LOG"

# Supervise whatever is already running, then keep relaunching.
PID=$(cat /tmp/pretrain.pid 2>/dev/null || echo "")
while :; do
  # 1. launch if nothing alive
  if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then
    EP=$(meta_epoch)
    if [ "$EP" -ge "$EPOCHS" ]; then
      echo "$(stamp) DONE: train_state at epoch $EP >= $EPOCHS" >> "$LOG"
      exit 0
    fi
    REM=$(( DEADLINE_S - $(date +%s) ))
    if [ "$REM" -le 300 ]; then
      echo "$(stamp) deadline reached at epoch $EP — stopping (machine must idle)" >> "$LOG"
      exit 0
    fi
    echo "$(stamp) launch from epoch $EP, budget ${REM}s" >> "$LOG"
    LITEASR_HARD_TIMEOUT_S="$REM" bash tools/run_pretrain.sh "$RUN" "$EPOCHS" \
      >> "$RUN/launcher.log" 2>&1 &
    PID=$!
    echo "$PID" > /tmp/pretrain.pid
    sleep 30
    continue
  fi
  # 2. deadline enforcement
  if [ "$(date +%s)" -ge "$DEADLINE_S" ]; then
    echo "$(stamp) deadline — killing $PID and exiting" >> "$LOG"
    kill_pid "$PID"
    exit 0
  fi
  # 3. stall detection
  AGE=$(log_age); LIM=$(stall_limit)
  if [ "$AGE" -gt "$LIM" ]; then
    echo "$(stamp) STALL: train.log silent ${AGE}s (limit ${LIM}s) — killing $PID for relaunch" >> "$LOG"
    kill_pid "$PID"
    PID=""
    sleep 10
    continue
  fi
  sleep 60
done
