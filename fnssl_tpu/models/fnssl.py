"""FN-SSL: alternating full-band / narrow-band LSTM network.

TPU-native re-design of the reference architecture (FN-SSL/Model.py:6-99):
3 FN blocks, each = BiLSTM over *frequency* (full-band, applied to nb·nt
independent rows) followed by an LSTM over *time* (narrow-band, nb·nf rows;
unidirectional when ``is_online``), with the reference's exact skip wiring:

  * fb_skip: previous block's full-band LSTM output (pre-dropout) added to
    the next block's full-band input.
  * nb_skip: block 1 concatenates the *raw input* (time-major) into its
    narrow LSTM input; blocks 2-3 add the previous narrow LSTM output.

Head: 12× time average-pool → Linear(256→2) → tanh → (nb, nt/12, 2·nf)
[cos; sin] DP-IPD, optionally → Linear(512→180) azimuth classifier.

Parameters are a nested dict keyed with the reference's state_dict names
(block_1.fullLstm.weight_ih_l0, emb2ipd.weight, ...) so torch checkpoints
convert losslessly.

Streaming: the narrow-band (time-axis) LSTMs and block-boundary skips are
the only cross-chunk state; `FNSSLState` carries them so chunked causal
inference is numerically identical to one-shot (a capability the reference
discards at block boundaries — SURVEY.md §5.7).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fnssl_tpu.models.lstm import LSTMState, init_lstm_params, lstm
from fnssl_tpu.models.layers import (
    avg_pool_time, dropout, init_linear_params, linear)

HIDDEN = 256
POOL = 12  # seg_fra_ratio: output frame rate = input/12


class FNSSLConfig(NamedTuple):
    input_size: int = 4
    hidden_size: int = HIDDEN
    is_online: bool = True
    is_doa: bool = False
    dropout: float = 0.2


class FNSSLState(NamedTuple):
    """Streaming carry: narrow-band LSTM state per block, batch = nb*nf."""
    narr: tuple[LSTMState, LSTMState, LSTMState]


def init_fnssl_params(key: jax.Array, cfg: FNSSLConfig = FNSSLConfig()):
    ks = jax.random.split(key, 8)
    h = cfg.hidden_size
    full_h = h // 2
    narr_h = h if cfg.is_online else h // 2
    narr_bidir = not cfg.is_online

    def block(kf, kn, input_size, is_first):
        narr_in = 2 * full_h + (input_size if is_first else 0)
        return {
            "fullLstm": init_lstm_params(kf, input_size, full_h,
                                         bidirectional=True),
            "narrLstm": init_lstm_params(kn, narr_in, narr_h,
                                         bidirectional=narr_bidir),
        }

    params = {
        "block_1": block(ks[0], ks[1], cfg.input_size, True),
        "block_2": block(ks[2], ks[3], h, False),
        "block_3": block(ks[4], ks[5], h, False),
        "emb2ipd": init_linear_params(ks[6], h, 2),
    }
    if cfg.is_doa:
        params["ipd2doa"] = init_linear_params(ks[7], 2 * h, 180)
    return params


def init_fnssl_state(nb: int, nf: int,
                     cfg: FNSSLConfig = FNSSLConfig()) -> FNSSLState:
    narr_h = cfg.hidden_size if cfg.is_online else cfg.hidden_size // 2
    ndir = 1 if cfg.is_online else 2
    z = jnp.zeros((ndir, nb * nf, narr_h), jnp.float32)
    return FNSSLState(narr=tuple(LSTMState(z, z) for _ in range(3)))


def _fnblock(params, x, fb_skip, nb_skip, *, is_first, is_online,
             drop, rngs, training, narr_state):
    """One FN block. x: (nb, nt, nf, nc)."""
    nb, nt, nf, nc = x.shape
    narr_bidir = not is_online
    nb_skip_raw = jnp.transpose(x, (0, 2, 1, 3)).reshape(nb * nf, nt, nc)

    x = x.reshape(nb * nt, nf, nc)
    if not is_first:
        x = x + fb_skip
    x, _ = lstm(params["fullLstm"], x, bidirectional=True)
    fb_out = x
    x = dropout(x, drop, rngs[0], training)

    x = x.reshape(nb, nt, nf, -1)
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(nb * nf, nt, -1)
    if is_first:
        x = jnp.concatenate([x, nb_skip_raw], axis=-1)
    else:
        x = x + nb_skip
    x, new_state = lstm(params["narrLstm"], x, state=narr_state,
                        bidirectional=narr_bidir)
    nb_out = x
    x = dropout(x, drop, rngs[1], training)

    x = x.reshape(nb, nf, nt, -1)
    x = jnp.transpose(x, (0, 2, 1, 3))  # (nb, nt, nf, h)
    return x, fb_out, nb_out, new_state


@functools.partial(jax.jit,
                   static_argnames=("cfg", "training", "return_state"))
def fnssl_apply(params, x: jax.Array, *, cfg: FNSSLConfig = FNSSLConfig(),
                rng: jax.Array | None = None, training: bool = False,
                state: FNSSLState | None = None, return_state: bool = False):
    """Forward pass.

    Args:
      x: (nb, nc=2·npair_feats, nf, nt) — the reference input layout
        (real/imag features stacked on channel axis).
      state: optional streaming carry (narrow LSTM states). When given, the
        time axis of `x` is treated as a continuation chunk.

    Returns:
      (nb, nt/12, 2·nf) DP-IPD regression (or (nb, nt/12, 180) if is_doa),
      plus the new FNSSLState when return_state.
    """
    x = jnp.transpose(x, (0, 3, 2, 1))  # (nb, nt, nf, nc)
    nb, nt, nf, nc = x.shape
    if state is None:
        state = init_fnssl_state(nb, nf, cfg)
    if rng is None:
        rngs = [None] * 6
    else:
        rngs = list(jax.random.split(rng, 6))

    fb = nbk = None
    new_narr = []
    for i, name in enumerate(("block_1", "block_2", "block_3")):
        x, fb, nbk, ns = _fnblock(
            params[name], x, fb, nbk,
            is_first=(i == 0), is_online=cfg.is_online, drop=cfg.dropout,
            rngs=rngs[2 * i:2 * i + 2], training=training,
            narr_state=state.narr[i])
        new_narr.append(ns)

    # head: (nb, nt, nf, h) → freq-major rows → pool 12× → ipd
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(nb * nf, nt, -1)
    ipd = avg_pool_time(x, POOL)
    ipd = jnp.tanh(linear(params["emb2ipd"], ipd))  # (nb*nf, nt2, 2)
    nt2 = ipd.shape[1]
    ipd = ipd.reshape(nb, nf, nt2, 2)
    ipd = jnp.transpose(ipd, (0, 2, 1, 3))  # (nb, nt2, nf, 2)
    result = jnp.concatenate([ipd[..., 0], ipd[..., 1]], axis=2)
    if cfg.is_doa:
        result = linear(params["ipd2doa"], result)
    if return_state:
        return result, FNSSLState(narr=tuple(new_narr))
    return result
