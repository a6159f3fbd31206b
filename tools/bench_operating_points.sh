#!/bin/bash
# Operating-point MFU study (BENCHMARKS.md "Utilization wall"): the wall
# section predicts that larger batch / longer buckets amortize the fixed
# bandwidth traffic (train-mode BN, rel-pos score tensor, mask/dropout)
# and push nominal MFU past the flagship point's 26.5%. bench.py's
# geometry is env-overridable (BENCH_B/T/U); runs tagged with a
# "geometry" key are studies, never the official capture.
#
# Usage: tools/bench_operating_points.sh [out.jsonl]
# Serial on the one chip — do NOT run while anything else holds the TPU.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/bench_points.jsonl}"
: > "$OUT"
export PYTHONPATH="$PWD:/root/.axon_site"
for GEOM in "64 800 48" "128 800 48" "32 1600 96"; do
  set -- $GEOM
  echo "=== B=$1 T=$2 U=$3 $(date '+%F %T')" >&2
  BENCH_B=$1 BENCH_T=$2 BENCH_U=$3 timeout 2400 python bench.py >> "$OUT" 2>/tmp/bench_point.err \
    || echo "{\"geometry\": {\"B\": $1, \"T\": $2, \"U\": $3}, \"error\": \"rc=$? (see /tmp/bench_point.err)\"}" >> "$OUT"
done
cat "$OUT"
