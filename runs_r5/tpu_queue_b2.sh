#!/bin/bash
# Round-5 TPU queue B stage 2 — variable_ipdnet EQUAL-STEP retrain.
# The 12-epoch bz=4 rerun (variable_ipdnet_scale_bz4_12ep.json) kept the
# r4 EPOCH budget but took 4x fewer optimizer steps (528/epoch vs 2112)
# and stalled at train loss 0.223 (the r4 bz=1 run's epoch-1 level) —
# equal epochs is not equal budget. This stage matches the r4 run
# step-for-step: 48 epochs x 528 steps = 25,344 steps = r4's 12 x 2112,
# with the per-STEP lr schedule identical (gamma 0.975**(528/2112) =
# 0.99369 per epoch). Waits for queue A's 256-budget stage to free the
# chip before starting.
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false
while [ ! -f runs_r5/ipdnet_scale_256_budget.test.json ]; do sleep 60; done
if [ ! -f runs_r5/variable_ipdnet_scale_eqstep.json ]; then
  python examples/train_variable_ipdnet_scale_tpu.py \
    /root/data_r4/varipd 704 256 48 4 0.99369 \
    runs_r5/variable_ipdnet_scale_eqstep.json || exit 1
fi
echo "=== VARIABLE EQSTEP RETRAIN DONE $(date) ==="
