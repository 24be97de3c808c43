"""One-shot TPU measurement of the two serving paths bench.py times —
the slot-batched pool (dispatcher window) and the full `cli serve` TCP
wire path — after the round-5 tier/NODELAY/batched-write/warmup work
(VERDICT r4 weak #3: single-conn RTF <=0.5, 16-conn aggregate within
~2x of the slot pool). Writes runs_r5/serve_tpu.json.

Run in a quiet chip window: concurrent device jobs timeslice the chip
and contaminate latency numbers.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fnssl_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import bench

print("slot-pool bench: building + warming tiers...", flush=True)
lat_ms, agg_rt, ticks = bench.bench_slot_pool(True)
print(json.dumps({"slot_pool16_latency_ms": round(lat_ms, 2),
                  "slot_pool16_aggregate_rt_x": round(agg_rt, 1),
                  "ticks": int(ticks)}), flush=True)
print("tcp serve bench: building + warming tiers...", flush=True)
rtt_ms, agg16, n_chunks = bench.bench_tcp_serve(True)
out = {"slot_pool16_latency_ms": round(lat_ms, 2),
       "slot_pool16_aggregate_rt_x": round(agg_rt, 1),
       "serve_tcp_rtt_ms_per_chunk_1conn": round(rtt_ms, 2),
       "serve_tcp_rtf_1conn": round(rtt_ms / 192.0, 3),
       "serve_tcp_16conn_aggregate_rt_x": round(agg16, 1),
       "r4_baseline": {"serve_tcp_rtt_ms_per_chunk_1conn": 179.5,
                       "serve_tcp_16conn_aggregate_rt_x": 5.3,
                       "slot_pool16_aggregate_rt_x": 28.6}}
print(json.dumps(out), flush=True)
os.makedirs("runs_r5", exist_ok=True)
with open("runs_r5/serve_tpu.json", "w") as f:
    json.dump(out, f, indent=1)
