"""Torch-compatible LSTM built on ``jax.lax.scan``.

Design (TPU-first, SURVEY.md §7.3): the FN blocks run thousands of
*independent* short sequences (nb·nt full-band rows over nf≈256 steps,
nb·nf narrow-band rows over nt≈298 steps). The throughput recipe on TPU is

  1. hoist the input projection out of the recurrence — one big
     (B·T, I)@(I, 4H) matmul that XLA tiles onto the MXU;
  2. scan only the hidden recurrence h@(H, 4H), with B in the thousands so
     every step is still MXU-shaped;
  3. bidirectional = a second scan with ``reverse=True`` (no data flip).

Parameter layout is exactly torch's ``nn.LSTM`` state_dict so reference
checkpoints convert losslessly (SURVEY.md §5.4):
  weight_ih_l0 (4H, I), weight_hh_l0 (4H, H), bias_ih_l0, bias_hh_l0
  [+ ``_reverse`` twins when bidirectional]. Gate order i, f, g, o.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class LSTMState(NamedTuple):
    """Streaming carry (h, c), each (num_dirs, B, H)."""
    h: jax.Array
    c: jax.Array


def init_lstm_params(key: jax.Array, input_size: int, hidden_size: int,
                     bidirectional: bool = False,
                     dtype=jnp.float32) -> dict[str, jax.Array]:
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init, torch's default."""
    k = 1.0 / math.sqrt(hidden_size)
    names = ["weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"]
    if bidirectional:
        names += [n + "_reverse" for n in names[:4]]
    shapes = {
        "weight_ih_l0": (4 * hidden_size, input_size),
        "weight_hh_l0": (4 * hidden_size, hidden_size),
        "bias_ih_l0": (4 * hidden_size,),
        "bias_hh_l0": (4 * hidden_size,),
    }
    params = {}
    keys = jax.random.split(key, len(names))
    for kk, name in zip(keys, names):
        base = name.replace("_reverse", "")
        params[name] = jax.random.uniform(
            kk, shapes[base], dtype, minval=-k, maxval=k)
    return params


def _one_direction(x: jax.Array, w_ih, w_hh, b_ih, b_hh,
                   h0: jax.Array, c0: jax.Array, reverse: bool):
    """x: (B, T, I) → (outputs (B, T, H), (hT, cT)).

    Dispatches to the fused Pallas recurrence on TPU (VMEM-resident
    state, double-buffered input gates — kernels/lstm_pallas.py); the
    lax.scan fallback elsewhere computes identically.
    """
    from fnssl_tpu.kernels.lstm_pallas import lstm_fused_scan

    ys, h_t, c_t = lstm_fused_scan(x, w_ih, w_hh, b_ih + b_hh, h0, c0,
                                   reverse)
    return ys, (h_t, c_t)


def lstm(params: dict[str, jax.Array], x: jax.Array,
         state: LSTMState | None = None,
         bidirectional: bool = False) -> tuple[jax.Array, LSTMState]:
    """Run an LSTM with torch semantics.

    Args:
      params: torch-named weight dict (see module docstring).
      x: (B, T, input_size).
      state: optional streaming carry; zeros if None. For bidirectional
        only the forward direction's carry is meaningful across chunks.

    Returns:
      outputs (B, T, H*num_dirs) and the final LSTMState.
    """
    b = x.shape[0]
    hidden = params["weight_hh_l0"].shape[1]
    ndir = 2 if bidirectional else 1
    if state is None:
        zeros = jnp.zeros((ndir, b, hidden), x.dtype)
        state = LSTMState(zeros, zeros)

    # NB a fused both-directions-per-step kernel was benchmarked and is
    # 2.6x SLOWER than two sequential single-direction kernels (the
    # doubled per-step DMA waits dominate); keep the two-pass design.
    out_f, (h_f, c_f) = _one_direction(
        x, params["weight_ih_l0"], params["weight_hh_l0"],
        params["bias_ih_l0"], params["bias_hh_l0"],
        state.h[0], state.c[0], reverse=False)
    if not bidirectional:
        return out_f, LSTMState(h_f[None], c_f[None])

    out_b, (h_b, c_b) = _one_direction(
        x, params["weight_ih_l0_reverse"], params["weight_hh_l0_reverse"],
        params["bias_ih_l0_reverse"], params["bias_hh_l0_reverse"],
        state.h[1], state.c[1], reverse=True)
    out = jnp.concatenate([out_f, out_b], axis=-1)
    return out, LSTMState(jnp.stack([h_f, h_b]), jnp.stack([c_f, c_b]))
