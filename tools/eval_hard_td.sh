#!/bin/bash
# Transducer statistical eval on the hard corpus (VERDICT r4 next-round #3):
# decode the 500-utt test set under the orderings the RNN-T decode stack
# claims — device beam search beats greedy (reference
# liteasr/models/transducer.py:137-206), checkpoint averaging beats the
# last checkpoint — and CI-score them with tools/score_ci.py
# (paired bootstrap, durable rows via --json-out).
#
# usage: tools/eval_hard_td.sh <run_dir> <last_epoch> [avg_num]
set -e
cd "$(dirname "$0")/.."
REPO="$PWD"
RUN="${1:?run dir}"
EP="${2:?last epoch}"
AVG="${3:-5}"
OUT="$RUN/eval_ep$EP"
RESULTS="${RESULTS:-$REPO/results/hard_td_r5_eval.jsonl}"
mkdir -p "$OUT"

run_infer() {  # name, extra overrides...
  local name="$1"; shift
  echo "=== $name ==="
  # pad_time_multiple=512 pins every decode batch to ONE compiled shape
  PYTHONPATH="${LITEASR_PYPATH:-$REPO:/root/.axon_site}" python -m liteasr_tpu.infer \
    --config-dir "$RUN" inference.ckpt_name="$EP" \
    dataset.pad_time_multiple=512 inference.batch_size=32 \
    inference.dump="$OUT/$name.tsv" "$@" 2>&1 | tail -2
}

run_infer avg_beam   inference.model_avg=true inference.avg_num="$AVG" \
                     inference.beam_size=8
run_infer avg_greedy inference.model_avg=true inference.avg_num="$AVG" \
                     inference.mode=transducer_greedy
run_infer last_beam  inference.model_avg=false inference.beam_size=8

echo "=== CIs ==="
python tools/score_ci.py "$OUT/avg_beam.tsv" --json-out "$RESULTS"
echo "--- beam vs greedy (paired) ---"
python tools/score_ci.py "$OUT/avg_beam.tsv" --vs "$OUT/avg_greedy.tsv" \
  --json-out "$RESULTS"
echo "--- averaged vs last checkpoint (paired, both beam) ---"
python tools/score_ci.py "$OUT/avg_beam.tsv" --vs "$OUT/last_beam.tsv" \
  --json-out "$RESULTS"
