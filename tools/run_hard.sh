#!/bin/bash
# Hard-corpus convergence runs (VERDICT r2 #6): the 31.8 h BPE-unit corpus
# (tools/make_synth_corpus.py --hard: 248-unit vocab, 10 tight confusable
# pairs, noise 0.55) targets a 2-10% token error regime so decode-mode and
# checkpoint-averaging comparisons have statistical power
# (tools/score_ci.py).
#
# usage: tools/run_hard.sh u2|transducer [run_dir] [epochs] [extra overrides...]
set -e
cd "$(dirname "$0")/.."
REPO="$PWD"
FAMILY="${1:-u2}"
RUN="${2:-$REPO/exp/hard_${FAMILY}_run}"
CORPUS="$REPO/exp/synth_hard"
EPOCHS="${3:-10}"
shift $(( $# > 3 ? 3 : $# ))
mkdir -p "$RUN"

case "$FAMILY" in
  u2)        MODEL="model=my_U2 criterion=my_hybrid_ctc" ;;
  transducer) MODEL="model=my_transducer criterion=my_rnnt" ;;
  # the round-3 glancing schedule + honest eval are part of the recipe:
  # without them pure-CIF decode degenerates (BENCHMARKS.md round 2; the
  # fixed-0.75 rerun on this corpus read 129% token error) — anneal
  # 0.75 -> 0.1 so the decoder must learn to read CIF vectors alone
  paraformer) MODEL="model=Paraformer criterion=paraformer_loss
    model.sample_ratio_end=0.1 model.sample_ratio_decay_steps=4000
    model.glance_at_eval=false" ;;
  *) echo "unknown family $FAMILY"; exit 1 ;;
esac

# LITEASR_HARD_TIMEOUT_S: absolute wall-clock kill so no launcher can run
# into a round boundary and poison the driver bench capture (VERDICT r3 #1a).
PYTHONPATH="$REPO:/root/.axon_site" exec timeout --signal=TERM --kill-after=120 "${LITEASR_HARD_TIMEOUT_S:-14400}" python -m liteasr_tpu.train \
  task=asr $MODEL optimizer=my_noam \
  task.vocab="$CORPUS/vocab.txt" 'task.delimiter=" "' \
  task.train="$CORPUS/train" task.valid="$CORPUS/valid" \
  "task.test=[$CORPUS/test]" \
  task.save_dir="$RUN/ckpts" common.run_dir="$RUN" \
  common.compile_cache_dir="$REPO/exp/.jax_cache" \
  model.dtype=bfloat16 \
  optimization.max_epoch="$EPOCHS" optimization.accum_grad=2 "$@"
