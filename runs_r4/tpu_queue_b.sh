#!/bin/bash
# Round-4 TPU queue B — the RealMAN pipeline run (VERDICT r3 #1, the
# top ask): IPDnet2 trained end-to-end through RealData on-the-fly
# mixing (per-item-seed sampler, 4 overlap modes, dp-energy VAD, SNR
# noise) on the synthetic RealMAN-format corpus, then held-out test at
# the published 0.5 gate, then the est-VAD operating-point sweep
# (VERDICT r3 #3's FAR-anomaly half). Loader-bound on the single host
# core, so it shares the chip with queue A's device-bound jobs.
set -x
cd /root/repo
export XLA_PYTHON_CLIENT_PREALLOCATE=false
RM=/root/data_r4/realman
FIT="python -m fnssl_tpu.cli.main fit"
TEST="python -m fnssl_tpu.cli.main test"

# corpus ready = every split's final CSV exists (written at split end)
while [ ! -f $RM/train/targets.csv ] || [ ! -f $RM/valid/targets.csv ] \
      || [ ! -f $RM/test/targets.csv ]; do
  sleep 60
done

# measured answer to "does the on-the-fly loader starve the chip?"
python examples/realman_loader_throughput.py $RM 96 16 \
  || echo "loader-throughput failed (non-fatal)"

D=/root/repo/runs_r4/ipdnet2_realman
if [ ! -f $D.test.json ]; then
  $FIT --model ipdnet2 \
    --train-dir $RM/train/ma_speech \
    --realman-csv $RM/train/targets.csv \
    --valid-dir $RM/valid/ma_speech \
    --realman-valid-csv $RM/valid/targets.csv \
    --realman-noise $RM/noise --realman-ext wav \
    --epochs 14 --bz 16 --precision bf16 --early-stop-patience 0 \
    --stall-restart-s 2400 --resume \
    --log-dir $D || exit 1
  $TEST --model ipdnet2 --best \
    --data-dir $RM/test/ma_speech \
    --realman-csv $RM/test/targets.csv \
    --realman-noise $RM/noise --realman-ext wav \
    --bz 16 --log-dir $D | tail -1 > $D.test.json || exit 1
fi
echo "=== ipdnet2 realman done $(date) ==="

python examples/ipdnet2_gate_sweep.py --log-dir $D \
  --data-dir $RM/test/ma_speech --csv $RM/test/targets.csv \
  --noise $RM/noise --out /root/repo/runs_r4/ipdnet2_gate_sweep.json \
  || echo "gate sweep failed (non-fatal)"
echo "=== QUEUE B DONE $(date) ==="
