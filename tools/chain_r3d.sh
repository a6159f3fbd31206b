#!/bin/bash
# Round-3 chain resumption: the chain_r3c.sh driver died with the previous
# builder session while its leg-1 wav2vec2 training survived as an orphan.
# Wait for that training to exit, summarize it, then continue chain_r3c
# from leg 2 (paraformer glancing schedule onward).
#
# usage: tools/chain_r3d.sh <w2v_pid>
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
W2V_PID="${1:?pid of the running wav2vec2 training}"

echo "$(date '+%F %T') chain_d: waiting on wav2vec2 pid $W2V_PID" >> /tmp/chain_c.log
while kill -0 "$W2V_PID" 2>/dev/null; do sleep 60; done
echo "$(date '+%F %T') chain_d: wav2vec2 exited" >> /tmp/chain_c.log
python tools/summarize_run.py exp/pretrain_run3/train.log \
  > /tmp/w2v_summary.txt 2>&1 || true

exec bash tools/chain_r3c.sh 2
