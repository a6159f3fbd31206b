#!/bin/bash
# One idle-chip window: every round-3 MFU A/B in sequence (VERDICT r2 #3).
# Run ONLY with no other TPU client (the tunnel compile server starves
# concurrent clients — memory/tpu-tunnel-ops).
#
#   1. micro-op attribution: XLA rel path vs the re-tiled bf16-operand
#      flash-train kernel, rel_shift variants, bn/ln/opt candidates
#   2. full-step ground truth: bench.py with flash_train off (default)
#      vs forced on
#
# usage: tools/ab_window.sh [out_dir]
set -x
cd "$(dirname "$0")/.."
REPO="$PWD"
export PYTHONPATH="$REPO:/root/.axon_site"
OUT="${1:-/tmp/ab_window}"
mkdir -p "$OUT"

timeout 3000 python tools/profile_microops.py flash attention rel_shift sub \
  > "$OUT/microops.txt" 2>&1
# long-context regime the re-tiled backward targets: 60-s utterances
PROF_T=1600 PROF_B=4 timeout 3600 python tools/profile_microops.py flash \
  > "$OUT/microops_longT.txt" 2>&1
timeout 2400 python bench.py > "$OUT/bench_flash_off.json" 2>"$OUT/bench_off.err"
LITEASR_FLASH_TRAIN=1 timeout 2400 python bench.py \
  > "$OUT/bench_flash_on.json" 2>"$OUT/bench_on.err"
tail -n +1 "$OUT"/microops.txt "$OUT"/bench_flash_*.json
