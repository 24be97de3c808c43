#!/bin/bash
# Round-4 TPU queue A — device-bound jobs (file-backed compact npz
# corpora, light host loading): the IPDnet scaling curve (VERDICT r3
# #3), then held-out scale runs for fnssl_doa and ipdnet_offline
# (VERDICT r3 #2). Runs concurrently with queue B (RealMAN, which is
# host-loader-bound); the axon device service multiplexes the chip.
# Every stage is resumable and skipped when its test.json exists.
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false
FIT="python -m fnssl_tpu.cli.main fit"
TEST="python -m fnssl_tpu.cli.main test"

# --- IPDnet scaling curve: nested train prefixes of one corpus ---
for N_E in "256 40" "2048 25" "8192 15" "16384 10"; do
  set -- $N_E; N=$1; E=$2
  D=/root/repo/runs_r4/ipdnet_scale_$N
  if [ ! -f $D.test.json ]; then
    while [ $(ls /root/data_r4/ipdnet/train | wc -l) -lt $N ]; do
      sleep 60
    done
    sleep 10   # let the generator close the N-th npz
    $FIT --model ipdnet \
      --train-dir /root/data_r4/ipdnet/train --train-size $N \
      --valid-dir /root/data_r4/ipdnet/dev \
      --epochs $E --bz 8 --precision bf16 --early-stop-patience 0 \
      --stall-restart-s 900 --resume \
      --log-dir $D || exit 1
    $TEST --model ipdnet --best \
      --data-dir /root/data_r4/ipdnet/test --bz 8 \
      --log-dir $D | tail -1 > $D.test.json || exit 1
  fi
  echo "=== scale $N done $(date) ==="

  # fnssl_doa + ipdnet_offline ride between curve points so the two
  # VERDICT-#2 runs land even if the 8k/16k points run long.
  if [ "$N" = 2048 ]; then
    D=/root/repo/runs_r4/fnssl_doa_2048
    if [ ! -f $D.test.json ]; then
      while [ $(ls /root/data_r4/fnssl/train 2>/dev/null | wc -l) -lt 2048 ]; do
        sleep 60
      done
      sleep 10   # let the generator close the last npz
      $FIT --model fnssl_doa \
        --train-dir /root/data_r4/fnssl/train \
        --valid-dir /root/data_r4/fnssl/dev \
        --epochs 30 --bz 16 --precision bf16 --early-stop-patience 0 \
        --stall-restart-s 900 --resume \
        --log-dir $D || exit 1
      $TEST --model fnssl_doa --best \
        --data-dir /root/data_r4/fnssl/test --bz 16 \
        --log-dir $D | tail -1 > $D.test.json || exit 1
    fi
    echo "=== fnssl_doa done $(date) ==="

    D=/root/repo/runs_r4/ipdnet_offline_2048
    if [ ! -f $D.test.json ]; then
      $FIT --model ipdnet_offline \
        --train-dir /root/data_r4/ipdnet/train --train-size 2048 \
        --valid-dir /root/data_r4/ipdnet/dev \
        --epochs 25 --bz 8 --precision bf16 --early-stop-patience 0 \
        --stall-restart-s 900 --resume \
        --log-dir $D || exit 1
      $TEST --model ipdnet_offline --best \
        --data-dir /root/data_r4/ipdnet/test --bz 8 \
        --log-dir $D | tail -1 > $D.test.json || exit 1
    fi
    echo "=== ipdnet_offline done $(date) ==="
  fi
done
echo "=== QUEUE A DONE $(date) ==="
