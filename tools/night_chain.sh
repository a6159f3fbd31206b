#!/bin/bash
# Serial TPU work chain for round 3 (no co-location: the tunnel compile
# server starves concurrent clients — see memory/tpu-tunnel-ops).
# Priority: scoreboard bench, wav2vec2 convergence (VERDICT #1), hard-corpus
# flagship + CI eval (#6), paraformer glancing run (#2), transducer-hard.
set -x
cd "$(dirname "$0")/.."
REPO="$PWD"
export PYTHONPATH="$REPO:/root/.axon_site"
STAMP() { date "+%F %T"; }

# Hard stop well before the round driver's own bench run: a training still
# holding the chip would contend with the recorded scoreboard number.
HARD_STOP=${HARD_STOP:-$(date -d "2026-08-18 02:45" +%s 2>/dev/null || echo 9999999999)}
run_for() {  # run_for <budget_s> <cmd...>: capped by the hard stop
  local budget=$1; shift
  local rem=$(( HARD_STOP - $(date +%s) ))
  if [ "$rem" -le 120 ]; then
    echo "$(STAMP) hard stop reached; skipping: $1" >> /tmp/chain.log
    return 125
  fi
  [ "$budget" -gt "$rem" ] && budget=$rem
  timeout "$budget" "$@"
}

echo "$(STAMP) chain start" > /tmp/chain.log

# 0. liveness probe (fail fast if the tunnel is still down)
run_for 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print('probe ok', float((x @ x).sum()))" \
  >> /tmp/chain.log 2>&1 || { echo "$(STAMP) TUNNEL DOWN" >> /tmp/chain.log; exit 1; }

# 1. bench (the round scoreboard), twice for the within-3% protocol
run_for 7200 python bench.py > /tmp/bench_r03_a.json 2>/tmp/bench_a.err
echo "$(STAMP) bench A: $(cat /tmp/bench_r03_a.json)" >> /tmp/chain.log
run_for 3600 python bench.py > /tmp/bench_r03_b.json 2>/tmp/bench_b.err
echo "$(STAMP) bench B: $(cat /tmp/bench_r03_b.json)" >> /tmp/chain.log

# 2. wav2vec2 to >=10k optimizer steps (epoch 20), resumed from ep-8 state
run_for 10800 python -m liteasr_tpu.train \
  task=pretrain model=wav2vec2 criterion=wav2vec optimizer=my_adam \
  optimizer.lr=2e-4 criterion.diversity_weight=1.0 \
  task.train=exp/synth_waves_xl/train task.valid=exp/synth_waves_xl/valid \
  task.save_dir=exp/pretrain_run3/ckpts common.run_dir=exp/pretrain_run3 \
  common.compile_cache_dir=exp/.jax_cache common.resume=auto \
  'common.trigger=[{name: report_loss, interval: 100, unit: iteration}, {name: valid, interval: 1, unit: epoch}, {name: save_model, interval: 2, unit: epoch}]' \
  model.dtype=bfloat16 \
  optimization.max_epoch=20 optimization.accum_grad=1 \
  optimization.clip_grad_norm=5.0 >> /tmp/chain.log 2>&1
echo "$(STAMP) wav2vec2 done rc=$?" >> /tmp/chain.log

# 3. hard-corpus flagship (6 epochs = ~12.7k micro-steps) + CI-scored eval
run_for 10800 bash tools/run_hard.sh u2 "$REPO/exp/hard_u2_run" 6 \
  >> /tmp/chain.log 2>&1
echo "$(STAMP) hard U2 done rc=$?" >> /tmp/chain.log
last_ep() { ls "$1"/model.ep.*.msgpack 2>/dev/null \
  | sed 's/.*ep\.\([0-9]*\).*/\1/' | sort -n | tail -1; }
EP=$(last_ep "$REPO/exp/hard_u2_run/ckpts")
if [ -n "$EP" ]; then
  run_for 7200 bash tools/eval_hard.sh "$REPO/exp/hard_u2_run" "$EP" 3 \
    > /tmp/eval_hard.log 2>&1
  echo "$(STAMP) eval@ep$EP done rc=$? -> /tmp/eval_hard.log" >> /tmp/chain.log
fi

# 4. paraformer glancing run (dense graph is compile-cached)
run_for 10800 python -m liteasr_tpu.train \
  task=asr model=Paraformer criterion=paraformer_loss optimizer=my_noam \
  task.vocab=exp/synth_corpus/vocab.txt \
  task.train=exp/synth_corpus/train task.valid=exp/synth_corpus/valid \
  'task.test=[exp/synth_corpus/test]' \
  task.save_dir=exp/paraformer_run3/ckpts common.run_dir=exp/paraformer_run3 \
  common.compile_cache_dir=exp/.jax_cache \
  'common.trigger=[{name: report_loss, interval: 100, unit: iteration}, {name: valid, interval: 1, unit: epoch}, {name: save_model, interval: 4, unit: epoch}]' \
  model.dtype=bfloat16 \
  model.sample_ratio=0.75 model.sample_ratio_end=0.1 \
  model.sample_ratio_decay_steps=8000 model.glance_at_eval=false \
  optimization.max_epoch=36 optimization.accum_grad=2 \
  >> /tmp/chain.log 2>&1
echo "$(STAMP) paraformer done rc=$?" >> /tmp/chain.log
PEP=$(last_ep "$REPO/exp/paraformer_run3/ckpts")
if [ -n "$PEP" ]; then
  # dense_cif=false: the decode graph would otherwise pay the dense CIF's
  # ~50-min tunnel compile for a once-per-batch op
  run_for 3600 python -m liteasr_tpu.infer --config-dir exp/paraformer_run3 \
    inference.ckpt_name="$PEP" inference.model_avg=true inference.avg_num=3 \
    model.dense_cif=false \
    dataset.pad_time_multiple=512 inference.batch_size=32 \
    inference.dump=/tmp/para_decode.tsv >> /tmp/chain.log 2>&1
  echo "$(STAMP) paraformer decode@ep$PEP rc=$?" >> /tmp/chain.log
  python tools/score_ci.py /tmp/para_decode.tsv --delimiter none \
    >> /tmp/chain.log 2>&1
fi

# 5. transducer on the hard corpus (smaller batch: joint-lattice memory)
run_for 10800 bash tools/run_hard.sh transducer "$REPO/exp/hard_td_run" 6 \
  dataset.batch_size=16 optimization.accum_grad=4 \
  >> /tmp/chain.log 2>&1
echo "$(STAMP) transducer done rc=$?" >> /tmp/chain.log
TEP=$(last_ep "$REPO/exp/hard_td_run/ckpts")
if [ -n "$TEP" ]; then
  run_for 3600 python -m liteasr_tpu.infer --config-dir exp/hard_td_run \
    inference.ckpt_name="$TEP" inference.model_avg=true inference.avg_num=3 \
    dataset.pad_time_multiple=512 inference.batch_size=32 \
    inference.dump=/tmp/td_decode.tsv >> /tmp/chain.log 2>&1
  echo "$(STAMP) transducer decode@ep$TEP rc=$?" >> /tmp/chain.log
  python tools/score_ci.py /tmp/td_decode.tsv >> /tmp/chain.log 2>&1
fi
# 6. streaming decode latency (VERDICT r2 #7 benchmark row)
run_for 3600 python tools/bench_streaming.py > /tmp/bench_streaming.json 2>&1
echo "$(STAMP) streaming bench: $(tail -1 /tmp/bench_streaming.json)" >> /tmp/chain.log
echo "$(STAMP) chain complete" >> /tmp/chain.log
