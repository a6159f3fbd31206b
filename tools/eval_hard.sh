#!/bin/bash
# Statistical eval on the hard corpus (VERDICT r2 #6): decode the test set
# under the decode-mode / checkpoint-averaging variants whose orderings
# BENCHMARKS.md claims, dump ref/hyp pairs, and report bootstrap CIs +
# paired-bootstrap p-values via tools/score_ci.py.
#
# usage: tools/eval_hard.sh <run_dir> <last_epoch> [avg_num]
set -e
cd "$(dirname "$0")/.."
REPO="$PWD"
RUN="${1:?run dir}"
EP="${2:?last epoch}"
AVG="${3:-5}"
OUT="$RUN/eval_ep$EP"
mkdir -p "$OUT"

run_infer() {  # name, extra overrides...
  local name="$1"; shift
  echo "=== $name ==="
  # pad_time_multiple=512 pins every decode batch to ONE compiled shape
  # (the remote-compile tunnel charges ~10-30 min per fresh decode graph)
  PYTHONPATH="${LITEASR_PYPATH:-$REPO:/root/.axon_site}" python -m liteasr_tpu.infer \
    --config-dir "$RUN" inference.ckpt_name="$EP" \
    dataset.pad_time_multiple=512 inference.batch_size=32 \
    inference.dump="$OUT/$name.tsv" "$@" 2>&1 | tail -2
}

# decode modes at the averaged checkpoint (reference default: rescore)
run_infer avg_rescore    inference.model_avg=true inference.avg_num="$AVG" \
                         inference.mode=attention_rescore
run_infer avg_ctc_greedy inference.model_avg=true inference.avg_num="$AVG" \
                         inference.mode=ctc_greedy
# averaging ablation at the rescore mode
run_infer last_rescore   inference.model_avg=false \
                         inference.mode=attention_rescore

echo "=== CIs ==="
python tools/score_ci.py "$OUT/avg_rescore.tsv"
echo "--- rescore vs ctc greedy (paired) ---"
python tools/score_ci.py "$OUT/avg_rescore.tsv" --vs "$OUT/avg_ctc_greedy.tsv"
echo "--- averaged vs last checkpoint (paired, both rescore) ---"
python tools/score_ci.py "$OUT/avg_rescore.tsv" --vs "$OUT/last_rescore.tsv"
