#!/bin/bash
# Round-5 TPU queue G v3 — the 32,768-scene scaling point at the
# 20,480-step budget (VERDICT r4 #1 under the r5 equal-budget
# methodology): the curve already has TWO rows at exactly this
# optimizer budget — 256 scenes (640 ep, ACC 0.888) and 16,384 scenes
# (10 ep, ACC 0.837) — so 5 epochs x 4,096 steps completes a clean
# 3-point data-scaling comparison at fixed budget. lr decay matched
# per STEP to those rows: gamma = 0.975^(4096/2048) = 0.950625
# (0.950625^5 = 0.975^10). If wall-clock remains, extend with
# --resume --epochs 8 for the 32,768-step row (the 16k e16 budget).
#   * gated on the corpus generator's DONE sentinel (ADVICE r4 #3)
#   * --rss-restart-gb 40 + MALLOC_ARENA_MAX=2: the r4 queue-G OOM
#     lesson (glibc arena fragmentation in the npz decode path)
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false
export MALLOC_ARENA_MAX=2
FIT="python -m fnssl_tpu.cli.main fit"
TEST="python -m fnssl_tpu.cli.main test"

until grep -q "GEN 32K DONE" /tmp/gen32k.log 2>/dev/null; do sleep 60; done
[ $(ls /root/data_r4/ipdnet/train | wc -l) -ge 32768 ] || exit 1

D=/root/repo/runs_r5/ipdnet_scale_32768
if [ ! -f $D.test.json ]; then
  $FIT --model ipdnet \
    --train-dir /root/data_r4/ipdnet/train --train-size 32768 \
    --valid-dir /root/data_r4/ipdnet/dev \
    --epochs 5 --bz 8 --precision bf16 --early-stop-patience 0 \
    --lr-gamma 0.950625 \
    --stall-restart-s 900 --rss-restart-gb 40 --resume \
    --log-dir $D || exit 1
  $TEST --model ipdnet --best \
    --data-dir /root/data_r4/ipdnet/test --bz 8 \
    --log-dir $D | tail -1 > $D.test.json || exit 1
fi
echo "=== QUEUE G3 (32k equal-budget) DONE $(date) ==="
