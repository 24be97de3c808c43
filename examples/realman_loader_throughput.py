"""RealMAN on-the-fly loader throughput (VERDICT r3 #1).

The reference's actual IPDnet2 training mode is ``RealData`` on-the-fly
mixing (IPDnet2/RecordData.py:13-322): per-channel reads, random 4 s
crop, dp-energy VAD, overlap-mode second-source mixing, SNR noise — all
host-side per item. On this container the ONE host core is shared with
the device feed, so the question "does the loader starve the chip?" is
answered by comparing the loader's standalone items/s against the
training step's consumption rate (bz / step_s).

Measures, over N items of the generated corpus:
  - cold items/s through RealData.__getitem__ (the real work),
  - batches/s through the prefetching DataLoader at the training bz,
  - bytes/s of assembled batch payload.

Usage: python examples/realman_loader_throughput.py \
           [root=/root/data_r4/realman] [n=96] [bz=16]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/root/data_r4/realman"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 96
BZ = int(sys.argv[3]) if len(sys.argv) > 3 else 16

from fnssl_tpu.data import DataLoader, RealData, collate_realman
from fnssl_tpu.parallel import host_local_slice

ds = RealData(os.path.join(ROOT, "train", "ma_speech"),
              [os.path.join(ROOT, "train", "targets.csv")],
              os.path.join(ROOT, "noise"),
              use_mic_id=[0, 1, 3, 5, 7], max_source=2, ext="wav")
n = min(N, len(ds))

# 1. raw per-item rate (seeded exactly as the sampler deals them)
sched = host_local_slice(len(ds), 0, seed=2, shuffle=True)[:n]
t0 = time.time()
for item in sched:
    ds[item]
item_s = n / (time.time() - t0)

# 2. through the prefetching DataLoader at the training batch size
sched = host_local_slice(len(ds), 1, seed=2, shuffle=True)[:n]
loader = DataLoader(lambda item: ds[item], sched, BZ, collate_realman,
                    num_workers=2, prefetch=2)
t0 = time.time()
nbytes = 0
nb = 0
for b in loader:
    nb += 1
    nbytes += sum(v.nbytes for v in b.values())
dt = time.time() - t0
out = {"n_items": n, "bz": BZ,
       "raw_items_per_s": round(item_s, 2),
       "loader_batches_per_s": round(nb / dt, 3),
       "loader_items_per_s": round(nb * BZ / dt, 2),
       "batch_mb_per_s": round(nbytes / dt / 1e6, 1)}
print(json.dumps(out, indent=1))
os.makedirs(os.path.join(REPO, "runs_r4"), exist_ok=True)
with open(os.path.join(REPO, "runs_r4", "realman_loader.json"), "w") as f:
    json.dump(out, f, indent=1)
