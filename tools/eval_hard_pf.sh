#!/bin/bash
# Paraformer statistical eval on the hard corpus (VERDICT r4 next-round
# #5): pure-CIF parallel decode (reference liteasr/models/paraformer.py:
# 104-129) on the 500-utt test set, averaged vs last checkpoint, CI-scored
# (tools/score_ci.py --json-out). The NAR-vs-AR comparison is made against
# the U2 rows in results/ at the matching band.
#
# usage: tools/eval_hard_pf.sh <run_dir> <last_epoch> [avg_num]
set -e
cd "$(dirname "$0")/.."
REPO="$PWD"
RUN="${1:?run dir}"
EP="${2:?last epoch}"
AVG="${3:-5}"
OUT="$RUN/eval_ep$EP"
RESULTS="${RESULTS:-$REPO/results/hard_pf_r5_eval.jsonl}"
mkdir -p "$OUT"

run_infer() {  # name, extra overrides...
  local name="$1"; shift
  echo "=== $name ==="
  PYTHONPATH="${LITEASR_PYPATH:-$REPO:/root/.axon_site}" python -m liteasr_tpu.infer \
    --config-dir "$RUN" inference.ckpt_name="$EP" \
    dataset.pad_time_multiple=512 inference.batch_size=32 \
    inference.dump="$OUT/$name.tsv" "$@" 2>&1 | tail -2
}

run_infer avg_cif  inference.model_avg=true inference.avg_num="$AVG"
run_infer last_cif inference.model_avg=false

echo "=== CIs ==="
python tools/score_ci.py "$OUT/avg_cif.tsv" --json-out "$RESULTS"
echo "--- averaged vs last checkpoint (paired) ---"
python tools/score_ci.py "$OUT/avg_cif.tsv" --vs "$OUT/last_cif.tsv" \
  --json-out "$RESULTS"
