#!/bin/bash
# Round-5 TPU queue E — RealMAN extension 28 -> 44 epochs WITH the
# decoded-sample cache (VERDICT r4 #5 "extend it further if the curve
# is still rising": 14ep 0.741 -> 28ep 0.797 at the published gate).
# Gated on the 32k scaling point AND queue D so the chip is quiet.
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false
while [ ! -f runs_r5/ipdnet_scale_32768.test.json ]; do sleep 60; done
while kill -0 $(cat /tmp/tpu_queue_d.pid) 2>/dev/null; do sleep 60; done
RM=/root/data_r4/realman
D=/root/repo/runs_r4/ipdnet2_realman
if [ ! -f runs_r5/ipdnet2_realman_e44.test.json ]; then
  python -m fnssl_tpu.cli.main fit --model ipdnet2 \
    --train-dir $RM/train/ma_speech \
    --realman-csv $RM/train/targets.csv \
    --valid-dir $RM/valid/ma_speech \
    --realman-valid-csv $RM/valid/targets.csv \
    --realman-noise $RM/noise --realman-ext wav \
    --realman-cache /root/data_r5/realman_cache \
    --epochs 44 --bz 16 --precision bf16 --early-stop-patience 0 \
    --workers 2 --prefetch 2 \
    --stall-restart-s 2400 --resume \
    --log-dir $D || exit 1
  python -m fnssl_tpu.cli.main test --model ipdnet2 --best \
    --data-dir $RM/test/ma_speech \
    --realman-csv $RM/test/targets.csv \
    --realman-noise $RM/noise --realman-ext wav \
    --bz 16 --log-dir $D | tail -1 > runs_r5/ipdnet2_realman_e44.test.json \
    || exit 1
fi
echo "=== QUEUE E DONE $(date) ==="
