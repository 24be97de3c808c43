#!/bin/bash
# Round-5 TPU queue F — the quiet-window tail:
#   1. wait for queue E (RealMAN e44 extension) to exit: after it the
#      chip is idle for the rest of the round
#   2. serve-path measurement (the 18:14 attempt hit its 1800 s timeout
#      because tier warmup shared the chip with the 32k fit compile) —
#      rerun with the chip quiet and a 3600 s bound
#   3. bench.py preflight: produces runs_r5/bench_preflight.json AND
#      pre-warms the persistent compile cache for the driver's
#      round-end bench run
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false
while kill -0 $(cat /tmp/tpu_queue_e.pid) 2>/dev/null; do sleep 60; done
if [ ! -f runs_r5/serve_tpu.json ]; then
  timeout 3600 python examples/serve_bench_tpu.py || true
fi
if [ ! -f runs_r5/bench_preflight.json ]; then
  FNSSL_BENCH_DEADLINE_S=3300 timeout 3600 python bench.py \
    | tail -1 > runs_r5/bench_preflight.json || true
fi
echo "=== QUEUE F DONE $(date) ==="
