"""Profiling: XLA trace capture + per-function wall/flops summaries.

The reference's tracing story is FLOPs-only (SURVEY.md §5.1); the TPU
equivalents here are ``jax.profiler`` traces (viewable in TensorBoard /
Perfetto) plus a micro-timing helper that syncs properly (the axon
platform's ``block_until_ready`` is unreliable right after compilation,
so timing fetches a value).
"""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace: ``with trace('runs/x/plugins'): ...``"""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(result):
    leaf = jax.tree.leaves(result)[0]
    np.asarray(leaf.ravel()[0], np.float32)


def time_fn(fn, *args, iters: int = 10, warmup: int = 1) -> dict:
    """Steady-state wall time of a jitted fn, with value-fetch sync.

    Returns {'mean_s', 'per_iter_ms', 'iters'}.
    """
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    result = None
    for _ in range(iters):
        result = fn(*args)
    _sync(result)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "per_iter_ms": dt * 1000.0, "iters": iters}


def summarize(fn, *args, name: str = "fn", iters: int = 10) -> dict:
    """Wall time + XLA cost analysis in one report."""
    from fnssl_tpu.utils.flops import cost_analysis

    cost = cost_analysis(fn, *args)
    timing = time_fn(jax.jit(fn), *args, iters=iters)
    out = {"name": name, **timing, **cost}
    if cost["flops"] > 0 and timing["mean_s"] > 0:
        out["tflops_per_s"] = cost["flops"] / timing["mean_s"] / 1e12
    return out
