"""Microphone-pair feature assembly.

Replaces the reference's python-loop batch surgery (AddChToBatch /
RemoveChFromBatch, FN-SSL/Module.py:376-421) with static vectorized gathers:
one XLA gather instead of O(nb·nch) slice-assignments.

Pair orderings match the reference exactly:
  'M'  : (0,1), (0,2), ..., (0,nch-1)                     → P = nch-1
  'MM' : (0,1)..(0,n-1), (1,2)..(1,n-1), ..., (n-2,n-1)   → P = nch(nch-1)/2
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pair_indices(nch: int, ch_mode: str) -> tuple[np.ndarray, np.ndarray]:
    """First/second mic index per pair, in reference order."""
    if ch_mode == "M":
        first = np.zeros(nch - 1, np.int32)
        second = np.arange(1, nch, dtype=np.int32)
    elif ch_mode == "MM":
        first = np.array([i for i in range(nch - 1)
                          for _ in range(i + 1, nch)], np.int32)
        second = np.array([j for i in range(nch - 1)
                           for j in range(i + 1, nch)], np.int32)
    else:
        raise ValueError(f"unknown ch_mode {ch_mode!r}")
    return first, second


def num_pairs(nch: int, ch_mode: str) -> int:
    return nch - 1 if ch_mode == "M" else nch * (nch - 1) // 2


@functools.partial(jax.jit, static_argnames=("ch_mode",))
def pair_rebatch(data: jax.Array, ch_mode: str = "M") -> jax.Array:
    """(nb, nch, ...) → (nb*P, 2, ...) with the pair dim folded into batch.

    Equivalent to reference AddChToBatch: out[b*P+p, 0] = data[b, first[p]],
    out[b*P+p, 1] = data[b, second[p]].
    """
    nb, nch = data.shape[:2]
    first, second = pair_indices(nch, ch_mode)
    a = data[:, first]    # (nb, P, ...)
    b = data[:, second]   # (nb, P, ...)
    out = jnp.stack([a, b], axis=2)  # (nb, P, 2, ...)
    return out.reshape((nb * len(first), 2) + data.shape[2:])


@functools.partial(jax.jit, static_argnames=("nb",))
def pair_unbatch(data: jax.Array, nb: int) -> jax.Array:
    """(nb*P, ...) → (nb, P, ...): inverse of the batch fold.

    Equivalent to reference RemoveChFromBatch (FN-SSL/Module.py:406-421).
    """
    p = data.shape[0] // nb
    return data.reshape((nb, p) + data.shape[1:])
