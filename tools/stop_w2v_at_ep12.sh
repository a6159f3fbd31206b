#!/bin/bash
# Budget rebalance: VERDICT r2 #1 asks for >=10k optimizer steps of
# sustained wav2vec2 improvement; at ~2,272 steps/epoch this run crosses
# 27k steps by epoch 12, so the remaining 8 epochs buy little evidence
# while starving the hard-corpus legs (#6). Stop the training once the
# epoch-12 checkpoint is on disk so chain_r3d proceeds to leg 2 early.
set -x
W2V_PID="${1:?pid}"
CK=/root/repo/exp/pretrain_run3/ckpts/model.ep.12.msgpack
LOG=/root/repo/exp/pretrain_run3/train.log
while kill -0 "$W2V_PID" 2>/dev/null; do
  if [ -f "$CK" ] && grep -q "13 / 20 epochs" "$LOG"; then
    sleep 5   # let any in-flight checkpoint writes settle
    kill "$W2V_PID"
    echo "$(date '+%F %T') stopped wav2vec2 at epoch-12 boundary (27k steps)" >> /tmp/chain_c.log
    exit 0
  fi
  sleep 30
done
echo "$(date '+%F %T') wav2vec2 exited on its own before the ep-12 stop" >> /tmp/chain_c.log
