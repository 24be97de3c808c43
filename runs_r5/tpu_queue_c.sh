#!/bin/bash
# Round-5 TPU queue C — RealMAN epoch time with the decoded cache
# (VERDICT r4 #6 done-criterion: epoch time vs the ~26 s device floor).
# Waits for queue B (variable retrain) to free the chip, then runs a
# 3-epoch ipdnet2 fit through the REAL RealMAN pipeline with
# --realman-cache: epoch 1 populates the cache (decode cost), epochs
# 2-3 measure the warm floor. Same corpus/recipe as the r4 run.
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false
while [ ! -f runs_r5/variable_ipdnet_scale.json ]; do sleep 60; done
D=/root/repo/runs_r5/ipdnet2_realman_cached
if [ ! -f $D/metrics.jsonl ] || \
   [ $(grep -c epoch_s $D/metrics.jsonl) -lt 3 ]; then
  timeout 5400 python -m fnssl_tpu.cli.main fit --model ipdnet2 \
    --train-dir /root/data_r4/realman/train/ma_speech \
    --realman-csv /root/data_r4/realman/train/targets.csv \
    --valid-dir /root/data_r4/realman/valid/ma_speech \
    --realman-valid-csv /root/data_r4/realman/valid/targets.csv \
    --realman-noise /root/data_r4/realman/noise --realman-ext wav \
    --realman-cache /root/data_r5/realman_cache \
    --epochs 3 --bz 16 --precision bf16 --early-stop-patience 0 \
    --workers 2 --prefetch 2 \
    --log-dir $D || exit 1
fi
grep epoch_s $D/metrics.jsonl
echo "=== REALMAN CACHED EPOCH MEASUREMENT DONE $(date) ==="
