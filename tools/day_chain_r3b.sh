#!/bin/bash
# Round-3 continuation: remaining serial TPU legs after the wav2vec2 run
# (tools/night_chain.sh step 2, launched separately). One TPU client at a
# time — the tunnel compile server starves concurrent clients.
#
#   leg 1  paraformer 36-epoch glancing-schedule run + decode + CI score
#          (VERDICT r2 #2; scan CIF: the dense graph costs ~52 min of cold
#          tunnel compile, scan ~20 min — memory/round3-recipes)
#   leg 2  hard-corpus flagship (VERDICT r2 #6) + CI-scored eval
#   leg 3  transducer on the hard corpus (stretch)
#   leg 4  streaming per-chunk latency benchmark row
#
# usage: tools/day_chain_r3b.sh [start_leg] ; HARD_STOP=<epoch-s> to cap
set -x
cd "$(dirname "$0")/.."
REPO="$PWD"
export PYTHONPATH="$REPO:/root/.axon_site"
START="${1:-1}"
STAMP() { date "+%F %T"; }
HARD_STOP=${HARD_STOP:-$(date -d "2026-08-18 17:30" +%s 2>/dev/null || echo 9999999999)}
run_for() {
  local budget=$1; shift
  local rem=$(( HARD_STOP - $(date +%s) ))
  if [ "$rem" -le 120 ]; then
    echo "$(STAMP) hard stop reached; skipping: $1" >> /tmp/chain_b.log
    return 125
  fi
  [ "$budget" -gt "$rem" ] && budget=$rem
  timeout "$budget" "$@"
}
last_ep() { ls "$1"/model.ep.*.msgpack 2>/dev/null \
  | sed 's/.*ep\.\([0-9]*\).*/\1/' | sort -n | tail -1; }

echo "$(STAMP) chain_b start at leg $START" >> /tmp/chain_b.log

if [ "$START" -le 1 ]; then
  run_for 10800 python -m liteasr_tpu.train \
    task=asr model=Paraformer criterion=paraformer_loss optimizer=my_noam \
    task.vocab=exp/synth_corpus/vocab.txt \
    task.train=exp/synth_corpus/train task.valid=exp/synth_corpus/valid \
    'task.test=[exp/synth_corpus/test]' \
    task.save_dir=exp/paraformer_run3/ckpts common.run_dir=exp/paraformer_run3 \
    common.compile_cache_dir=exp/.jax_cache common.resume=auto \
    'common.trigger=[{name: report_loss, interval: 100, unit: iteration}, {name: valid, interval: 1, unit: epoch}, {name: save_model, interval: 4, unit: epoch}]' \
    model.dtype=bfloat16 model.dense_cif=false optimization.fused_step=true \
    model.sample_ratio=0.75 model.sample_ratio_end=0.1 \
    model.sample_ratio_decay_steps=8000 model.glance_at_eval=false \
    optimization.max_epoch=36 optimization.accum_grad=2 \
    >> /tmp/chain_b.log 2>&1
  echo "$(STAMP) paraformer done rc=$?" >> /tmp/chain_b.log
  PEP=$(last_ep "$REPO/exp/paraformer_run3/ckpts")
  if [ -n "$PEP" ]; then
    run_for 3600 python -m liteasr_tpu.infer --config-dir exp/paraformer_run3 \
      inference.ckpt_name="$PEP" inference.model_avg=true inference.avg_num=3 \
      model.dense_cif=false \
      dataset.pad_time_multiple=512 inference.batch_size=32 \
      inference.dump=/tmp/para_decode.tsv >> /tmp/chain_b.log 2>&1
    echo "$(STAMP) paraformer decode@ep$PEP rc=$?" >> /tmp/chain_b.log
    python tools/score_ci.py /tmp/para_decode.tsv --delimiter none \
      >> /tmp/chain_b.log 2>&1
  fi
fi

if [ "$START" -le 2 ]; then
  run_for 9000 bash tools/run_hard.sh u2 "$REPO/exp/hard_u2_run" 6 \
    optimization.fused_step=true >> /tmp/chain_b.log 2>&1
  echo "$(STAMP) hard U2 done rc=$?" >> /tmp/chain_b.log
  EP=$(last_ep "$REPO/exp/hard_u2_run/ckpts")
  if [ -n "$EP" ]; then
    run_for 7200 bash tools/eval_hard.sh "$REPO/exp/hard_u2_run" "$EP" 3 \
      > /tmp/eval_hard.log 2>&1
    echo "$(STAMP) eval@ep$EP done rc=$? -> /tmp/eval_hard.log" >> /tmp/chain_b.log
  fi
fi

if [ "$START" -le 3 ]; then
  run_for 9000 bash tools/run_hard.sh transducer "$REPO/exp/hard_td_run" 4 \
    dataset.batch_size=16 optimization.accum_grad=4 \
    optimization.fused_step=true >> /tmp/chain_b.log 2>&1
  echo "$(STAMP) transducer done rc=$?" >> /tmp/chain_b.log
  TEP=$(last_ep "$REPO/exp/hard_td_run/ckpts")
  if [ -n "$TEP" ]; then
    run_for 3600 python -m liteasr_tpu.infer --config-dir exp/hard_td_run \
      inference.ckpt_name="$TEP" inference.model_avg=true inference.avg_num=3 \
      dataset.pad_time_multiple=512 inference.batch_size=32 \
      inference.dump=/tmp/td_decode.tsv >> /tmp/chain_b.log 2>&1
    echo "$(STAMP) transducer decode@ep$TEP rc=$?" >> /tmp/chain_b.log
    python tools/score_ci.py /tmp/td_decode.tsv >> /tmp/chain_b.log 2>&1
  fi
fi

if [ "$START" -le 4 ]; then
  run_for 3600 python tools/bench_streaming.py > /tmp/bench_streaming.json 2>&1
  echo "$(STAMP) streaming bench: $(tail -1 /tmp/bench_streaming.json)" >> /tmp/chain_b.log
fi
echo "$(STAMP) chain_b complete" >> /tmp/chain_b.log
