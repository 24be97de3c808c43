#!/bin/bash
# Round-5 TPU queue D — sequencer for the quiet-chip window:
#   1. wait for queue A stage 1 (256-budget) to finish: test.json exists
#   2. wait for queue C (RealMAN cached-epoch fit) to exit
#   3. TPU serve bench (tiered slot pool + TCP wire path) in the gap
#   4. variable_ipdnet EQUAL-STEP retrain (replaces queue B2; see
#      tpu_queue_b2.sh header for the 12-epoch bz=4 undertraining story)
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false
while [ ! -f runs_r5/ipdnet_scale_256_budget.test.json ]; do sleep 30; done
while kill -0 $(cat /tmp/tpu_queue_c.pid) 2>/dev/null; do sleep 30; done
if [ ! -f runs_r5/serve_tpu.json ]; then
  timeout 1800 python examples/serve_bench_tpu.py || true
fi
if [ ! -f runs_r5/variable_ipdnet_scale_eqstep.json ]; then
  python examples/train_variable_ipdnet_scale_tpu.py \
    /root/data_r4/varipd 704 256 48 4 0.99369 \
    runs_r5/variable_ipdnet_scale_eqstep.json || exit 1
fi
echo "=== QUEUE D DONE $(date) ==="
