#!/bin/bash
# Round-3 continuation chain (after the checkpoint-selection fix): waits on
# the in-flight hard-corpus U2 resume (12 -> 48 epochs), then runs the
# remaining evidence + profiling legs serially (one TPU client at a time —
# the tunnel compile server starves concurrent clients).
#
#  1. eval_hard on U2@48 (CI-scored decode-mode + averaging A/Bs, VERDICT #6)
#  2. paraformer TPU decode with the FIXED epoch-aligned N-best selection
#     (1-best + 3-best; CPU runs measured 1.24% — confirm on TPU)
#  3. transducer-hard resume 4 -> 16 epochs + 3-avg decode + CI
#  4. current step anatomy (profile_train) for the MFU push
#  5. bench.py twice (scoreboard protocol)
#
# usage: tools/chain_r3e.sh <hard_u2_pid>; HARD_STOP=<epoch-s> caps legs
set -x
cd "$(dirname "$0")/.."
REPO="$PWD"
export PYTHONPATH="$REPO:/root/.axon_site"
U2_PID="${1:?pid of the running hard-U2 training}"
LOG=/tmp/chain_e.log
STAMP() { date "+%F %T"; }
HARD_STOP=${HARD_STOP:-$(date -d "2026-08-19 07:30" +%s 2>/dev/null || echo 9999999999)}
run_for() {
  local budget=$1; shift
  local rem=$(( HARD_STOP - $(date +%s) ))
  if [ "$rem" -le 120 ]; then
    echo "$(STAMP) hard stop reached; skipping: $1" >> "$LOG"
    return 125
  fi
  [ "$budget" -gt "$rem" ] && budget=$rem
  timeout "$budget" "$@"
}
last_ep() { ls "$1"/model.ep.*.msgpack 2>/dev/null \
  | sed 's/.*ep\.\([0-9]*\).*/\1/' | sort -n | tail -1; }

echo "$(STAMP) chain_e: waiting on hard-U2 pid $U2_PID" >> "$LOG"
while kill -0 "$U2_PID" 2>/dev/null; do sleep 60; done
echo "$(STAMP) chain_e: hard-U2 exited" >> "$LOG"

# 1. CI-scored eval of the 48-epoch U2
EP=$(last_ep "$REPO/exp/hard_u2_run/ckpts")
if [ -n "$EP" ]; then
  run_for 5400 bash tools/eval_hard.sh "$REPO/exp/hard_u2_run" "$EP" 5 \
    > /tmp/eval_hard48.log 2>&1
  echo "$(STAMP) eval_hard@ep$EP rc=$? -> /tmp/eval_hard48.log" >> "$LOG"
fi

# 2. paraformer decode on TPU with the fixed selection (graphs cached)
for AVG in 1 3; do
  run_for 2400 python -m liteasr_tpu.infer --config-dir exp/paraformer_run3 \
    inference.ckpt_name=36 inference.model_avg=true inference.avg_num=$AVG \
    model.dense_cif=false dataset.pad_time_multiple=512 \
    inference.batch_size=32 \
    inference.dump=/tmp/para_tpu_best$AVG.tsv >> "$LOG" 2>&1
  echo "$(STAMP) paraformer tpu avg$AVG rc=$?" >> "$LOG"
  python tools/score_ci.py /tmp/para_tpu_best$AVG.tsv --delimiter none \
    >> "$LOG" 2>&1
done

# 3. transducer-hard: 4 -> 16 epochs, then 3-avg decode + CI
run_for 10800 bash tools/run_hard.sh transducer "$REPO/exp/hard_td_run" 16 \
  dataset.batch_size=16 optimization.accum_grad=4 \
  optimization.fused_step=true common.resume=auto >> "$LOG" 2>&1
echo "$(STAMP) transducer-hard rc=$?" >> "$LOG"
TEP=$(last_ep "$REPO/exp/hard_td_run/ckpts")
if [ -n "$TEP" ]; then
  run_for 3600 python -m liteasr_tpu.infer --config-dir exp/hard_td_run \
    inference.ckpt_name="$TEP" inference.model_avg=true inference.avg_num=3 \
    dataset.pad_time_multiple=512 inference.batch_size=32 \
    inference.dump=/tmp/td_decode16.tsv >> "$LOG" 2>&1
  echo "$(STAMP) transducer decode@ep$TEP rc=$?" >> "$LOG"
  python tools/score_ci.py /tmp/td_decode16.tsv >> "$LOG" 2>&1
fi

# 4. current step anatomy after the round-3 fused passes (MFU push input)
run_for 1800 python tools/profile_train.py > /tmp/profile_train_r3.log 2>&1
echo "$(STAMP) profile_train rc=$?" >> "$LOG"

# 5. scoreboard bench, twice
for i in 1 2; do
  run_for 1800 python bench.py > /tmp/bench_r3_$i.json 2>&1
  echo "$(STAMP) bench $i: $(tail -1 /tmp/bench_r3_$i.json)" >> "$LOG"
done

echo "$(STAMP) chain_e complete" >> "$LOG"
