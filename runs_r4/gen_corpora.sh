#!/bin/bash
# Round-4 corpus generation queue (one host core; sequential).
# Resumable end-to-end: generate() skips existing scene files and the
# RealMAN generator keeps a targets.csv.part, so re-running after an
# interruption continues where it stopped. Ordered by downstream need:
# the curve's 256/2048/8192 points first, then the RealMAN corpus
# (VERDICT r3 ask #1), then fnssl (ask #2/#6), then the 16384 tail.
set -x
cd /root/repo
P="python -m fnssl_tpu.cli.main simulate"
$P --preset ipdnet --stage dev  --T 4.5 --num-source 2 --compact \
   --num 512   --out /root/data_r4/ipdnet/dev   || exit 1
$P --preset ipdnet --stage test --T 4.5 --num-source 2 --compact \
   --num 512   --out /root/data_r4/ipdnet/test  || exit 1
$P --preset ipdnet --stage train --T 4.5 --num-source 2 --compact \
   --num 8192  --out /root/data_r4/ipdnet/train || exit 1
echo "=== IPDNET 8192 DONE $(date) ==="
python examples/gen_realman_corpus.py /root/data_r4/realman \
   2048 256 256 || exit 1
echo "=== REALMAN CORPUS DONE $(date) ==="
$P --preset fnssl --seed 200 --compact --num 2048 \
   --out /root/data_r4/fnssl/train || exit 1
$P --preset fnssl --seed 201 --compact --num 256 \
   --out /root/data_r4/fnssl/dev   || exit 1
$P --preset fnssl --seed 202 --compact --num 256 \
   --out /root/data_r4/fnssl/test  || exit 1
echo "=== FNSSL CORPUS DONE $(date) ==="
$P --preset ipdnet --stage train --T 4.5 --num-source 2 --compact \
   --num 16384 --out /root/data_r4/ipdnet/train || exit 1
echo "=== ALL GENERATION DONE $(date) ==="
