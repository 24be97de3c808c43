#!/bin/bash
# Round-5 TPU queue — sequential, resumable (each stage skips itself
# when its test.json exists).
#
# Stage 1 (VERDICT r4 #7): the curve's missing budget control — 256
#   scenes at the SAME step budget as the 16k 10-epoch point
#   (640 epochs × 32 steps = 20,480 steps, bz 8) with the lr decay
#   matched per STEP (0.975^(32/2048) per epoch) and --valid-every 20
#   so validation doesn't dominate the tiny epochs.
# Stage 2 (VERDICT r4 #1): the 32,768-scene point at 16 epochs
#   (65,536 steps) to test the +0.02/doubling extrapolation. Gated on
#   the generator PROCESS exiting (not a file-count race — ADVICE r4
#   #3): the generator writes files sequentially and exits after the
#   last one.
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false
FIT="python -m fnssl_tpu.cli.main fit"
TEST="python -m fnssl_tpu.cli.main test"

D=/root/repo/runs_r5/ipdnet_scale_256_budget
if [ ! -f $D.test.json ]; then
  $FIT --model ipdnet \
    --train-dir /root/data_r4/ipdnet/train --train-size 256 \
    --valid-dir /root/data_r4/ipdnet/dev \
    --epochs 640 --bz 8 --precision bf16 --early-stop-patience 0 \
    --valid-every 20 --lr-gamma 0.9996044 \
    --stall-restart-s 900 --resume \
    --log-dir $D || exit 1
  $TEST --model ipdnet --best \
    --data-dir /root/data_r4/ipdnet/test --bz 8 \
    --log-dir $D | tail -1 > $D.test.json || exit 1
fi
echo "=== 256-budget-control DONE $(date) ==="

D=/root/repo/runs_r5/ipdnet_scale_32768
if [ ! -f $D.test.json ]; then
  # wait for the corpus generator to EXIT (it writes scene files
  # sequentially, so process-gone + count means every file is closed)
  while kill -0 $(cat /tmp/gen32k.pid) 2>/dev/null; do sleep 60; done
  [ $(ls /root/data_r4/ipdnet/train | wc -l) -ge 32768 ] || exit 1
  $FIT --model ipdnet \
    --train-dir /root/data_r4/ipdnet/train --train-size 32768 \
    --valid-dir /root/data_r4/ipdnet/dev \
    --epochs 16 --bz 8 --precision bf16 --early-stop-patience 0 \
    --stall-restart-s 900 --resume \
    --log-dir $D || exit 1
  $TEST --model ipdnet --best \
    --data-dir /root/data_r4/ipdnet/test --bz 8 \
    --log-dir $D | tail -1 > $D.test.json || exit 1
fi
echo "=== 32768-scene point DONE $(date) ==="
