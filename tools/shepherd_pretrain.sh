#!/bin/bash
# Shepherd the wav2vec2 plateau run (tools/run_pretrain.sh) to max_epoch
# across timeout kills / tunnel drops, under one ABSOLUTE wall-clock
# deadline so nothing can run into the round boundary and poison the
# driver's bench capture (VERDICT r3 "what's weak" #1).
#
# Usage: DEADLINE="2026-08-20 04:10" tools/shepherd_pretrain.sh [run_dir] [epochs]
# Waits for any already-running launcher (pid in /tmp/pretrain.pid) to
# exit, then relaunches run_pretrain.sh (resume=auto) until the saved
# train_state reaches the target epoch or the deadline passes.
set -u
cd "$(dirname "$0")/.."
REPO="$PWD"
RUN="${1:-$REPO/exp/pretrain_run4}"
EPOCHS="${2:-36}"
DEADLINE_S=$(date -d "${DEADLINE:?set DEADLINE, e.g. 2026-08-20 04:10}" +%s)
LOG=/tmp/shepherd.log
stamp() { date "+%F %T"; }
meta_epoch() {
  python - "$RUN/ckpts/train_state.msgpack.meta" <<'EOF' 2>/dev/null || echo -1
import json, sys
print(json.load(open(sys.argv[1]))["epoch"])
EOF
}

echo "$(stamp) shepherd start: run=$RUN target=$EPOCHS deadline=$DEADLINE" >> "$LOG"

# Phase 1: wait out the launcher that is already running, if any.
if [ -f /tmp/pretrain.pid ]; then
  PID=$(cat /tmp/pretrain.pid)
  while kill -0 "$PID" 2>/dev/null; do
    if [ "$(date +%s)" -ge "$DEADLINE_S" ]; then
      echo "$(stamp) deadline during phase 1 — killing $PID" >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 130
      exit 0
    fi
    sleep 60
  done
  echo "$(stamp) existing launcher $PID exited (epoch=$(meta_epoch))" >> "$LOG"
fi

# Phase 2: relaunch until the target epoch is in the saved state.
while :; do
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
  echo "$(stamp) relaunch from epoch $EP, budget ${REM}s" >> "$LOG"
  LITEASR_HARD_TIMEOUT_S="$REM" bash tools/run_pretrain.sh "$RUN" "$EPOCHS" \
    >> "$RUN/launcher.log" 2>&1 &
  echo $! > /tmp/pretrain.pid
  wait $!
  echo "$(stamp) launcher exited rc=$? (epoch=$(meta_epoch))" >> "$LOG"
  sleep 10
done
