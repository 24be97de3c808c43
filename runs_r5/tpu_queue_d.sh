#!/bin/bash
# Round-5 TPU queue D (v2) — sequencer for the quiet-chip window:
#   1. wait for queue A stage 1 (256-budget) test.json
#   2. RealMAN cached-epoch measurement (3-epoch fit; the first attempt
#      died on the cache tmp-file thread collision, fixed in 99af26d;
#      the cache is already hot from that attempt, so epoch 1 is warm)
#   3. TPU serve bench (tiered slot pool + TCP wire path)
#   4. variable_ipdnet EQUAL-STEP retrain (48 x 528 steps, bz 4,
#      per-step lr schedule matching the r4 bz=1 run)
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false
while [ ! -f runs_r5/ipdnet_scale_256_budget.test.json ]; do sleep 30; done
D=/root/repo/runs_r5/ipdnet2_realman_cached
if [ ! -f $D/metrics.jsonl ] || \
   [ $(grep -c epoch_s $D/metrics.jsonl) -lt 3 ]; then
  timeout 3600 python -m fnssl_tpu.cli.main fit --model ipdnet2 \
    --train-dir /root/data_r4/realman/train/ma_speech \
    --realman-csv /root/data_r4/realman/train/targets.csv \
    --valid-dir /root/data_r4/realman/valid/ma_speech \
    --realman-valid-csv /root/data_r4/realman/valid/targets.csv \
    --realman-noise /root/data_r4/realman/noise --realman-ext wav \
    --realman-cache /root/data_r5/realman_cache \
    --epochs 3 --bz 16 --precision bf16 --early-stop-patience 0 \
    --workers 2 --prefetch 2 \
    --log-dir $D || exit 1
  grep epoch_s $D/metrics.jsonl
fi
if [ ! -f runs_r5/serve_tpu.json ]; then
  timeout 1800 python examples/serve_bench_tpu.py || true
fi
if [ ! -f runs_r5/variable_ipdnet_scale_eqstep.json ]; then
  python examples/train_variable_ipdnet_scale_tpu.py \
    /root/data_r4/varipd 704 256 48 4 0.99369 \
    runs_r5/variable_ipdnet_scale_eqstep.json || exit 1
fi
echo "=== QUEUE D DONE $(date) ==="
