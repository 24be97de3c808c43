"""RealMAN loader throughput WITH the decoded-sample cache (VERDICT r4
#6 follow-up to examples/realman_loader_throughput.py).

The r4 measurement: raw 3.27 items/s, prefetched 10.2 items/s vs the
training step's ~80 items/s consumption — 8× loader-bound on this one
host core, dominated by re-decoding the same wavs every epoch.
``RealData(cache_dir=...)`` decodes each file once into an .npy and
mmaps it afterwards. This measures:
  - cold items/s while POPULATING the cache (epoch-1 cost),
  - warm items/s raw and through the prefetching DataLoader
    (every later epoch),
against the same corpus/seeds as the r4 harness.

Usage: python examples/realman_loader_cached.py \
           [root=/root/data_r4/realman] [n=96] [bz=16] \
           [cache=/root/data_r5/realman_cache]
"""
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/root/data_r4/realman"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 96
BZ = int(sys.argv[3]) if len(sys.argv) > 3 else 16
CACHE = sys.argv[4] if len(sys.argv) > 4 else "/root/data_r5/realman_cache"

from fnssl_tpu.data import DataLoader, RealData, collate_realman
from fnssl_tpu.parallel import host_local_slice

shutil.rmtree(CACHE, ignore_errors=True)
ds = RealData(os.path.join(ROOT, "train", "ma_speech"),
              [os.path.join(ROOT, "train", "targets.csv")],
              os.path.join(ROOT, "noise"),
              use_mic_id=[0, 1, 3, 5, 7], max_source=2, ext="wav",
              cache_dir=CACHE)
n = min(N, len(ds))
sched = host_local_slice(len(ds), 0, seed=2, shuffle=True)[:n]

t0 = time.time()
for item in sched:                       # epoch 1: decode + populate
    ds[item]
cold_s = n / (time.time() - t0)

t0 = time.time()
for item in sched:                       # warm: pure mmap hits
    ds[item]
warm_s = n / (time.time() - t0)

loader = DataLoader(lambda item: ds[item],
                    host_local_slice(len(ds), 1, seed=2, shuffle=True)[:n],
                    BZ, collate_realman, num_workers=2, prefetch=2)
t0 = time.time()
nb = sum(1 for _ in loader)
warm_loader_s = nb * BZ / (time.time() - t0)

cache_gb = sum(os.path.getsize(os.path.join(CACHE, f))
               for f in os.listdir(CACHE)) / 1e9
out = {"n_items": n, "bz": BZ,
       "cold_populate_items_per_s": round(cold_s, 2),
       "warm_items_per_s": round(warm_s, 2),
       "warm_loader_items_per_s": round(warm_loader_s, 2),
       "cache_gb_for_n": round(cache_gb, 2),
       "r4_uncached_raw": 3.27, "r4_uncached_loader": 10.2}
print(json.dumps(out, indent=1))
os.makedirs(os.path.join(REPO, "runs_r5"), exist_ok=True)
with open(os.path.join(REPO, "runs_r5", "realman_loader_cached.json"),
          "w") as f:
    json.dump(out, f, indent=1)
