#!/bin/bash
# Paraformer convergence run on the synthetic feature corpus
# (tools/make_synth_corpus.py), full operating point (reference
# liteasr/models/paraformer.py + config defaults): conformer-free 12L/256d
# rel-pos transformer encoder + CIF predictor + 6L parallel decoder,
# glancing training (sample_ratio 0.75), bf16, Noam warmup.
set -e
cd "$(dirname "$0")/.."
REPO="$PWD"
RUN="${1:-$REPO/exp/paraformer_run}"
CORPUS="$REPO/exp/synth_corpus"
EPOCHS="${2:-48}"
mkdir -p "$RUN"

# LITEASR_HARD_TIMEOUT_S: absolute wall-clock kill so no launcher can run
# into a round boundary and poison the driver bench capture (VERDICT r3 #1a).
PYTHONPATH="$REPO:/root/.axon_site" exec timeout --signal=TERM --kill-after=120 "${LITEASR_HARD_TIMEOUT_S:-14400}" python -m liteasr_tpu.train \
  task=asr model=Paraformer criterion=paraformer_loss optimizer=my_noam \
  task.vocab="$CORPUS/vocab.txt" \
  task.train="$CORPUS/train" task.valid="$CORPUS/valid" \
  "task.test=[$CORPUS/test]" \
  task.save_dir="$RUN/ckpts" common.run_dir="$RUN" \
  model.dtype=bfloat16 \
  optimization.max_epoch="$EPOCHS"
