#!/bin/bash
# IPDnet scaling curve (VERDICT r3 #3): nested train subsets of ONE
# compact corpus, same dev/test splits, same model + published gates.
# Each stage waits until the (index-ordered, resumable) generator has
# written its train prefix, fits, then tests at the published gates.
set -x
cd /root/repo
for N_E in "256 40" "2048 25" "8192 15" "16384 10"; do
  set -- $N_E; N=$1; E=$2
  D=/root/repo/runs_r4/ipdnet_scale_$N
  if [ ! -f $D.test.json ]; then
    while [ $(ls /root/data_r4/ipdnet/train | wc -l) -lt $N ]; do
      sleep 60
    done
    python -m fnssl_tpu.cli.main fit --model ipdnet \
      --train-dir /root/data_r4/ipdnet/train --train-size $N \
      --valid-dir /root/data_r4/ipdnet/dev \
      --epochs $E --bz 8 --precision bf16 --early-stop-patience 0 \
      --stall-restart-s 900 --resume \
      --log-dir $D || exit 1
    python -m fnssl_tpu.cli.main test --model ipdnet --best \
      --data-dir /root/data_r4/ipdnet/test --bz 8 \
      --log-dir $D | tail -1 > $D.test.json || exit 1
  fi
  echo "=== scale $N done $(date) ==="
done
echo "=== CURVE DONE $(date) ==="
