#!/bin/bash
# Extend the 16,384-scene curve point from 10 to 16 epochs (the 10-epoch
# budget left valid loss still falling — this separates data-scale from
# optimization-budget in the scaling table). Resumable like queue A.
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false
D=/root/repo/runs_r4/ipdnet_scale_16384
python -m fnssl_tpu.cli.main fit --model ipdnet \
  --train-dir /root/data_r4/ipdnet/train --train-size 16384 \
  --valid-dir /root/data_r4/ipdnet/dev \
  --epochs 16 --bz 8 --precision bf16 --early-stop-patience 0 \
  --stall-restart-s 900 --resume \
  --log-dir $D || exit 1
python -m fnssl_tpu.cli.main test --model ipdnet --best \
  --data-dir /root/data_r4/ipdnet/test --bz 8 \
  --log-dir $D | tail -1 > ${D}_e16.test.json || exit 1
echo "=== EXTEND 16384 DONE $(date) ==="
