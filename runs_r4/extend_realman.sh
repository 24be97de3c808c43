#!/bin/bash
# Deepen the RealMAN run (VERDICT r3 #1): resume ipdnet2_realman from
# epoch 14 to 28 (valid was still improving at 13), then re-test at the
# published gate. Waits for the 16k curve extension to free the chip.
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false
while [ ! -f /root/repo/runs_r4/ipdnet_scale_16384_e16.test.json ]; do
  sleep 60
done
RM=/root/data_r4/realman
D=/root/repo/runs_r4/ipdnet2_realman
python -m fnssl_tpu.cli.main fit --model ipdnet2 \
  --train-dir $RM/train/ma_speech \
  --realman-csv $RM/train/targets.csv \
  --valid-dir $RM/valid/ma_speech \
  --realman-valid-csv $RM/valid/targets.csv \
  --realman-noise $RM/noise --realman-ext wav \
  --epochs 28 --bz 16 --precision bf16 --early-stop-patience 0 \
  --stall-restart-s 2400 --resume \
  --log-dir $D || exit 1
python -m fnssl_tpu.cli.main test --model ipdnet2 --best \
  --data-dir $RM/test/ma_speech \
  --realman-csv $RM/test/targets.csv \
  --realman-noise $RM/noise --realman-ext wav \
  --bz 16 --log-dir $D | tail -1 > ${D}_e28.test.json || exit 1
echo "=== EXTEND REALMAN DONE $(date) ==="
