#!/bin/bash
# Round-4 queue C — host-core-heavy jobs, sequenced after the corpus
# generator frees the single core: multi-process DP measurement
# (VERDICT r3 #6, CPU platform) once the fnssl corpus exists, then the
# VariableIPDnet scale run (VERDICT r3 #2 — generates its own 4-geometry
# corpus, so it must not overlap gen_corpora.sh).
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false

while ! grep -q "FNSSL CORPUS DONE" /root/data_r4/gen.log; do sleep 60; done
# writes runs_r4/dp_equivalence.json itself
python examples/dp_equivalence_cpu.py /root/data_r4/fnssl/train \
  /root/data_r4/fnssl/dev 128 3 || echo "dp_equivalence failed"
echo "=== dp equivalence done $(date) ==="

while ! grep -q "ALL GENERATION DONE" /root/data_r4/gen.log; do sleep 60; done
python examples/train_variable_ipdnet_scale_tpu.py /root/data_r4/varipd \
  704 256 12 > /root/repo/runs_r4/variable_ipdnet_scale.log 2>&1 \
  || echo "variable_ipdnet scale failed"
tail -n 3 /root/repo/runs_r4/variable_ipdnet_scale.log
echo "=== QUEUE C DONE $(date) ==="
