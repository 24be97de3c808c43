#!/bin/bash
# Round-5 TPU queue G v2 — the 32,768-scene scaling point at EQUAL
# optimizer budget (VERDICT r4 #1, with the methodology the r5
# 256-scene budget control established: only equal-step rows compare).
#   * 8 epochs x 4,096 steps = 32,768 steps — the same step budget as
#     the 16k x 16-epoch point (0.876); lr decay matched per STEP:
#     gamma = 0.975^(4096/2048) = 0.950625.
#   * gated on the corpus generator's DONE sentinel, not a file-count
#     race (ADVICE r4 #3).
#   * --rss-restart-gb 40 + MALLOC_ARENA_MAX=2: the r4 queue-G OOM
#     lesson (glibc arena fragmentation in the npz decode path).
# If time remains after the test eval, extend with --resume --epochs 16
# (a budget-extension control at fixed data, like r4's 16k e10->e16).
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
    --epochs 8 --bz 8 --precision bf16 --early-stop-patience 0 \
    --lr-gamma 0.950625 \
    --stall-restart-s 900 --rss-restart-gb 40 --resume \
    --log-dir $D || exit 1
  $TEST --model ipdnet --best \
    --data-dir /root/data_r4/ipdnet/test --bz 8 \
    --log-dir $D | tail -1 > $D.test.json || exit 1
fi
echo "=== QUEUE G2 (32k equal-step) DONE $(date) ==="
