#!/bin/bash
# Round-5 TPU queue G — restart the 32,768-scene scaling point after
# the 19:19 global OOM (three device jobs shared the 125 GB host; the
# fit's anon RSS hit 78.6 GB before its default 87 GB self-heal bound,
# and the kernel picked it). Changes vs tpu_queue.sh stage 2:
#   * --rss-restart-gb 40: checkpoint + re-exec well below any OOM
#     line even if other jobs appear (the fit resumes losslessly; the
#     growth is glibc arena fragmentation from the npz decode path,
#     not a real working set — the corpus is 8.9 GB on disk)
#   * MALLOC_ARENA_MAX=2: curb per-thread arena fragmentation at the
#     source
#   * gated on the serve bench (quiet-chip measurement) finishing
# Resumes from the epoch-3 checkpoint already in the run dir.
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false
export MALLOC_ARENA_MAX=2
FIT="python -m fnssl_tpu.cli.main fit"
TEST="python -m fnssl_tpu.cli.main test"

while kill -0 $(cat /tmp/serve_bench.pid) 2>/dev/null; do sleep 30; done

D=/root/repo/runs_r5/ipdnet_scale_32768
if [ ! -f $D.test.json ]; then
  $FIT --model ipdnet \
    --train-dir /root/data_r4/ipdnet/train --train-size 32768 \
    --valid-dir /root/data_r4/ipdnet/dev \
    --epochs 16 --bz 8 --precision bf16 --early-stop-patience 0 \
    --stall-restart-s 900 --rss-restart-gb 40 --resume \
    --log-dir $D || exit 1
  $TEST --model ipdnet --best \
    --data-dir /root/data_r4/ipdnet/test --bz 8 \
    --log-dir $D | tail -1 > $D.test.json || exit 1
fi
echo "=== QUEUE G (32k restart) DONE $(date) ==="
