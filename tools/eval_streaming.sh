#!/bin/bash
# Streaming accuracy cost (VERDICT r4 next-round #4): on a dynamic_chunk-
# trained U2 (reference liteasr/utils/mask.py:30-90 stage mechanism),
# decode the hard-corpus test set offline full-context vs chunk-by-chunk
# streaming (liteasr_tpu/streaming.py) at two chunk sizes, same CTC greedy
# decoder throughout so the delta isolates the chunking context loss.
# CI-scored paired deltas via tools/score_ci.py.
#
# usage: tools/eval_streaming.sh <run_dir> <epoch> [avg_num]
set -e
cd "$(dirname "$0")/.."
REPO="$PWD"
RUN="${1:?run dir}"
EP="${2:?last epoch}"
AVG="${3:-5}"
OUT="$RUN/eval_stream_ep$EP"
RESULTS="${RESULTS:-$REPO/results/streaming_r5_eval.jsonl}"
mkdir -p "$OUT"

run_infer() {  # name, extra overrides...
  local name="$1"; shift
  echo "=== $name ==="
  PYTHONPATH="${LITEASR_PYPATH:-$REPO:/root/.axon_site}" python -m liteasr_tpu.infer \
    --config-dir "$RUN" inference.ckpt_name="$EP" \
    inference.model_avg=true inference.avg_num="$AVG" \
    dataset.pad_time_multiple=512 inference.batch_size=32 \
    inference.dump="$OUT/$name.tsv" "$@" 2>&1 | tail -2
}

run_infer offline_greedy inference.mode=ctc_greedy
run_infer stream_c16     inference.mode=streaming_ctc_greedy \
                         inference.chunk_sub=16
run_infer stream_c8      inference.mode=streaming_ctc_greedy \
                         inference.chunk_sub=8

echo "=== CIs ==="
python tools/score_ci.py "$OUT/offline_greedy.tsv" --json-out "$RESULTS"
echo "--- offline vs streaming chunk_sub=16 (paired) ---"
python tools/score_ci.py "$OUT/offline_greedy.tsv" --vs "$OUT/stream_c16.tsv" \
  --json-out "$RESULTS"
echo "--- offline vs streaming chunk_sub=8 (paired) ---"
python tools/score_ci.py "$OUT/offline_greedy.tsv" --vs "$OUT/stream_c8.tsv" \
  --json-out "$RESULTS"
echo "--- streaming 16 vs 8 (paired) ---"
python tools/score_ci.py "$OUT/stream_c16.tsv" --vs "$OUT/stream_c8.tsv" \
  --json-out "$RESULTS"
