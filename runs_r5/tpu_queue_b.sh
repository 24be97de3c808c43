#!/bin/bash
# Round-5 TPU queue B — variable_ipdnet retrain with within-topology
# batching (VERDICT r4 #4): same 3-topology corpus and budget as the r4
# run (3×704 scenes × 12 epochs), now bz=8 same-geometry batches, and
# the unseen-geometry eval reports both decodes (reference parity and
# scale_norm="utterance"). Runs concurrently with queue A (both are
# device-bound; the axon service timeslices the chip).
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false
if [ ! -f runs_r5/variable_ipdnet_scale.json ]; then
  python examples/train_variable_ipdnet_scale_tpu.py \
    /root/data_r4/varipd 704 256 12 4 || exit 1
fi
echo "=== VARIABLE RETRAIN DONE $(date) ==="
