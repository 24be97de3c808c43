"""FLOPs / cost accounting via XLA's compiled cost analysis.

Replaces the reference's torcheval/FlopCounterMode harness
(*/utils/flops.py:28-156, FixedAarryIPDnet.py:139-147,
IPDnet2/IPDnet2.py:426-431): writes the same ``FLOPs.yaml`` schema
{flops_forward, flops_backward, params, fs, audio_time_len, num_chns}
so runs remain cost-comparable with reference runs.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def cost_analysis(fn, *args) -> dict:
    """XLA cost analysis of jit(fn)(*args): flops + bytes accessed."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a per-computation list
        cost = cost[0]
    return {"flops": float(cost.get("flops", -1.0)),
            "bytes_accessed": float(cost.get("bytes accessed", -1.0))}


def count_params(params) -> int:
    return int(sum(np.size(x) for x in jax.tree.leaves(params)))


def flops_forward_backward(apply_fn, params, example) -> dict:
    """FLOPs of the forward and of a full value-and-grad step."""
    fwd = cost_analysis(apply_fn, params, example)

    def loss(p, x):
        return jnp.sum(apply_fn(p, x) ** 2)

    fwdbwd = cost_analysis(jax.value_and_grad(loss), params, example)
    return {
        "flops_forward": fwd["flops"],
        "flops_backward": max(fwdbwd["flops"] - fwd["flops"], 0.0),
        "bytes_accessed_forward": fwd["bytes_accessed"],
        "params": count_params(params),
    }


def write_flops(apply_fn, params, example, save_dir: str,
                fs: int = 16000, audio_time_len: float = 4.79,
                num_chns: int = 2) -> dict:
    """Write FLOPs.yaml in the reference schema (utils/flops.py:33-49)."""
    import yaml

    stats = flops_forward_backward(apply_fn, params, example)
    stats.update(fs=fs, audio_time_len=audio_time_len, num_chns=num_chns)
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "FLOPs.yaml"), "w") as f:
        yaml.safe_dump(stats, f)
    return stats
