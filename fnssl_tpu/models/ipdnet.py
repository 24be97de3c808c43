"""IPDnet: multi-track DP-IPD estimation (fixed & variable arrays).

TPU-native re-implementation of the reference architectures:
  * Fixed-array IPDnet (IPDnet/FixedAarryIPDnet.py:7-120): 2 FN blocks
    whose LSTM outputs are each concatenated with the *raw input* skip,
    then a causal CNN head (3 causal 3×3 convs, ReLU, AvgPool (1,3)+(1,4)
    → 12× time compression, tanh) producing (nb, nt/12, 2nf, nmic-1,
    max_track) multi-track IPD. Output reshapes replicate the reference's
    exact permute/reshape chain so converted checkpoints are bit-faithful.
  * Variable-array IPDnet (IPDnet/VariableArrayIPDnet.py:6-118): mic pairs
    ride the batch axis; each block concatenates the mean embedding across
    pairs plus the raw skip and projects through Linear+PReLU around the
    narrow-band LSTM. NB: the *shipped* reference file crashes (its
    narrLstm is declared with input_size=hidden+skip but receives
    linear1's hidden-sized output — verified RuntimeError); we implement
    the intended wiring (narrLstm input = hidden).

Streaming: FN-block narrow LSTMs and the head's three causal conv tails
are carried in ``IPDnetState``, enabling chunked causal inference that is
exactly equal to one-shot when chunks are multiples of 12 frames.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fnssl_tpu.models.layers import (
    conv2d, dropout, init_conv2d_params, init_linear_params,
    init_prelu_params, linear, prelu)
from fnssl_tpu.models.lstm import LSTMState, init_lstm_params, lstm

POOL = 12


class IPDnetConfig(NamedTuple):
    input_size: int = 4          # 2·nmic (re+im per mic)
    hidden_size: int = 128
    max_track: int = 2
    is_online: bool = True
    dropout: float = 0.2
    n_seg: int = 312             # offline chunked-inference segment length


class ConvState(NamedTuple):
    """Causal-conv ring buffers: last 2 frames at each head rate."""
    c1: jax.Array  # (nb, cin, nf, 2) at frame rate
    c2: jax.Array  # (nb, h, nf, 2) at rate/3
    c3: jax.Array  # (nb, h, nf, 2) at rate/12


class IPDnetState(NamedTuple):
    narr: tuple[LSTMState, ...]
    conv: ConvState


def init_ipdnet_params(key: jax.Array, cfg: IPDnetConfig = IPDnetConfig()):
    ks = jax.random.split(key, 8)
    h, i = cfg.hidden_size, cfg.input_size
    full_h = h // 2
    narr_h = h if cfg.is_online else h // 2
    narr_bidir = not cfg.is_online

    def block(kf, kn, in_size):
        return {
            "fullLstm": init_lstm_params(kf, in_size, full_h,
                                         bidirectional=True),
            "narrLstm": init_lstm_params(kn, 2 * full_h + i, narr_h,
                                         bidirectional=narr_bidir),
        }

    cnn_in = h + i
    cnn_out = 2 * (i // 2 - 1) * cfg.max_track
    return {
        "block_1": block(ks[0], ks[1], i),
        "block_2": block(ks[2], ks[3], h + i),
        "conv": {
            "conv1": init_conv2d_params(ks[4], cnn_in, 128, (3, 3),
                                        bias=False),
            "conv2": init_conv2d_params(ks[5], 128, 128, (3, 3),
                                        bias=False),
            "conv3": init_conv2d_params(ks[6], 128, cnn_out, (3, 3),
                                        bias=False),
        },
    }


def init_ipdnet_state(nb: int, nf: int,
                      cfg: IPDnetConfig = IPDnetConfig()) -> IPDnetState:
    h = cfg.hidden_size
    narr_h = h if cfg.is_online else h // 2
    ndir = 1 if cfg.is_online else 2
    z = jnp.zeros((ndir, nb * nf, narr_h), jnp.float32)
    return IPDnetState(
        narr=(LSTMState(z, z), LSTMState(z, z)),
        conv=ConvState(
            jnp.zeros((nb, h + cfg.input_size, nf, 2), jnp.float32),
            jnp.zeros((nb, 128, nf, 2), jnp.float32),
            jnp.zeros((nb, 128, nf, 2), jnp.float32)))


def _fnblock(params, x, fb_skip, nb_skip, *, is_online, drop, rngs,
             training, narr_state):
    """IPDnet FN block (FixedAarryIPDnet.py:29-41): skips are CONCATS of
    the raw input after each LSTM. x: (nb, nt, nf, nc)."""
    nb, nt, nf, nc = x.shape
    x = x.reshape(nb * nt, nf, nc)
    x, _ = lstm(params["fullLstm"], x, bidirectional=True)
    x = dropout(x, drop, rngs[0], training)
    x = jnp.concatenate([x, fb_skip], axis=-1)
    x = x.reshape(nb, nt, nf, -1)
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(nb * nf, nt, -1)
    x, new_state = lstm(params["narrLstm"], x, state=narr_state,
                        bidirectional=not is_online)
    x = dropout(x, drop, rngs[1], training)
    x = jnp.concatenate([x, nb_skip], axis=-1)
    x = x.reshape(nb, nf, nt, -1)
    return jnp.transpose(x, (0, 2, 1, 3)), new_state


def _caus_cnn(params, x, conv_state: ConvState | None):
    """Causal CNN head (FixedAarryIPDnet.py:43-73). x: (nb, c, nf, nt).

    The torch version pads time by 2 both sides and crops 2 on the right
    — equivalent to a pure left-pad of 2 (causal). Streaming substitutes
    the carried tail for the zero left-pad.
    """
    def causal(p, x, tail):
        if tail is None:
            x_in = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (2, 0)))
        else:
            x_in = jnp.concatenate([tail, x], axis=-1)
        new_tail = x_in[..., -2:]
        return conv2d(p, x_in, padding=((1, 1), (0, 0))), new_tail

    def pool_t(x, k):
        nb, c, nf, nt = x.shape
        return x[..., : nt // k * k].reshape(nb, c, nf, nt // k, k).mean(-1)

    t1 = conv_state.c1 if conv_state is not None else None
    t2 = conv_state.c2 if conv_state is not None else None
    t3 = conv_state.c3 if conv_state is not None else None
    out, n1 = causal(params["conv1"], x, t1)
    out = jax.nn.relu(out)
    out = pool_t(out, 3)
    out, n2 = causal(params["conv2"], out, t2)
    out = jax.nn.relu(out)
    out = pool_t(out, 4)
    out, n3 = causal(params["conv3"], out, t3)
    return jnp.tanh(out), ConvState(n1, n2, n3)


@functools.partial(jax.jit, static_argnames=("cfg", "training",
                                             "return_state",
                                             "offline_inference"))
def ipdnet_apply(params, x: jax.Array, *,
                 cfg: IPDnetConfig = IPDnetConfig(),
                 rng: jax.Array | None = None, training: bool = False,
                 state: IPDnetState | None = None,
                 return_state: bool = False,
                 offline_inference: bool = False):
    """Forward. x: (nb, nc, nf, nt) → (nb, nt/12, 2nf, nmic-1, max_track).

    ``offline_inference`` (non-online nets) chunks long inputs into
    ``cfg.n_seg``-frame segments batched through the net and re-stitched
    (FixedAarryIPDnet.py:97-117).
    """
    nb0, nc0, nf0, nt0 = x.shape
    ou_frame = nt0 // POOL
    nseg = 1
    if offline_inference and not cfg.is_online:
        seg = cfg.n_seg
        pad = (-nt0) % seg
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad)))
        nseg = x.shape[-1] // seg
        x = x.reshape(nb0, nc0, nf0, nseg, seg)
        x = jnp.transpose(x, (0, 3, 1, 2, 4)).reshape(
            nb0 * nseg, nc0, nf0, seg)

    x = jnp.transpose(x, (0, 3, 2, 1))  # (nb, nt, nf, nc)
    nb, nt, nf, nc = x.shape
    if state is None:
        st = init_ipdnet_state(nb, nf, cfg)
    else:
        st = state
    rngs = ([None] * 4 if rng is None else list(jax.random.split(rng, 4)))

    fb_skip = x.reshape(nb * nt, nf, nc)
    nb_skip = jnp.transpose(x, (0, 2, 1, 3)).reshape(nb * nf, nt, nc)

    new_narr = []
    for i, name in enumerate(("block_1", "block_2")):
        x, ns = _fnblock(params[name], x, fb_skip, nb_skip,
                         is_online=cfg.is_online, drop=cfg.dropout,
                         rngs=rngs[2 * i: 2 * i + 2], training=training,
                         narr_state=st.narr[i])
        new_narr.append(ns)

    x = jnp.transpose(x, (0, 3, 2, 1))          # (nb, c, nf, nt)
    nt2 = nt // POOL
    conv_in_state = st.conv if state is not None else None
    x, new_conv = _caus_cnn(params["conv"], x, conv_in_state)

    # reference output reshape chain (FixedAarryIPDnet.py:111-117)
    x = jnp.transpose(x, (0, 3, 2, 1))          # (nb, nt2, nf, out)
    x = x.reshape(nb, nt2, nf, 2, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))       # (nb, nt2, 2, nf, K)
    if offline_inference and not cfg.is_online:
        x = x.reshape(nb // nseg, nt2 * nseg, 2, nf * 2, -1)
        x = jnp.transpose(x, (0, 1, 3, 4, 2))
        out = x[:, :ou_frame]
    else:
        x = x.reshape(nb, nt2, 2, nf * 2, -1)
        out = jnp.transpose(x, (0, 1, 3, 4, 2))
    if return_state:
        return out, IPDnetState(tuple(new_narr), new_conv)
    return out


# ---------------------------------------------------------------------------
# Variable-array IPDnet


class VariableIPDnetConfig(NamedTuple):
    input_size: int = 4
    hidden_size: int = 128
    is_online: bool = True
    dropout: float = 0.2


def init_variable_ipdnet_params(key: jax.Array,
                                cfg: VariableIPDnetConfig
                                = VariableIPDnetConfig()):
    ks = jax.random.split(key, 12)
    h, i = cfg.hidden_size, cfg.input_size
    full_h = h // 2
    narr_h = h if cfg.is_online else h // 2

    def block(k0, k1, k2, k3, k4, k5, in_size):
        return {
            "fullLstm": init_lstm_params(k0, in_size, full_h,
                                         bidirectional=True),
            # intended wiring: narrLstm consumes linear1's output (h)
            "narrLstm": init_lstm_params(k1, h, narr_h,
                                         bidirectional=not cfg.is_online),
            "linear1": init_linear_params(k2, 2 * h + i, h),
            "linear2": init_linear_params(k3, narr_h * (
                1 if cfg.is_online else 2) * 2 + i, h),
            "relu1": init_prelu_params(),
            "relu2": init_prelu_params(),
        }

    return {
        "block_1": block(*ks[0:6], i),
        "block_2": block(*ks[6:12], h),
        "conv": {
            "conv1": init_conv2d_params(jax.random.fold_in(key, 101),
                                        h, 128, (3, 3), bias=False),
            "conv2": init_conv2d_params(jax.random.fold_in(key, 102),
                                        128, 128, (3, 3), bias=False),
            "conv3": init_conv2d_params(jax.random.fold_in(key, 103),
                                        128, 4, (3, 3), bias=False),
        },
    }


def _pair_mean(x, npair: int):
    """Mean over each utterance's OWN pair group, broadcast back. The
    batch axis is nb-major pairs (core.pairs.pair_rebatch layout:
    row b·P+p), so utterances must not mix in the mean."""
    nbp = x.shape[0]
    nb = nbp // npair
    g = x.reshape((nb, npair) + x.shape[1:])
    mean = jnp.mean(g, axis=1, keepdims=True)
    return jnp.broadcast_to(mean, g.shape).reshape(x.shape)


def _fnblock_mean(params, x, skip, *, npair, is_online, drop, rngs,
                  training):
    """Pair-mean FN block (VariableArrayIPDnet.py:33-55). The batch axis
    of ``x`` is nb·npair; means are over each utterance's pair group."""
    nbp, nt, nf, nc = x.shape
    x = x.reshape(nbp * nt, nf, nc)
    x, _ = lstm(params["fullLstm"], x, bidirectional=True)
    x = dropout(x, drop, rngs[0], training)
    x = x.reshape(nbp, nt, nf, -1)
    x = jnp.concatenate([x, _pair_mean(x, npair), skip], axis=-1)
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(nbp * nf, nt, -1)
    x = prelu(params["relu1"], linear(params["linear1"], x))
    x, _ = lstm(params["narrLstm"], x, bidirectional=not is_online)
    x = dropout(x, drop, rngs[1], training)
    x = x.reshape(nbp, nf, nt, -1)
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = jnp.concatenate([x, _pair_mean(x, npair), skip], axis=-1)
    return prelu(params["relu2"], linear(params["linear2"], x))


@functools.partial(jax.jit, static_argnames=("cfg", "training", "npair"))
def variable_ipdnet_apply(params, x: jax.Array, *,
                          cfg: VariableIPDnetConfig = VariableIPDnetConfig(),
                          rng: jax.Array | None = None,
                          training: bool = False,
                          npair: int | None = None):
    """x: (nb·npair, nc=4, nf, nt) — mic pairs on the batch axis in
    nb-major pair_rebatch order. ``npair`` is the pairs-per-utterance
    count; None means ONE utterance (the reference's bz=1 convention,
    VariableArrayIPDnet.py:107-118). Same-topology utterances batch by
    stacking their pair groups — the pair means stay per-utterance.
    Returns (nb, nt/12, 2nf, npair, 2 tracks)."""
    if npair is None:
        npair = x.shape[0]
    x = jnp.transpose(x, (0, 3, 2, 1))
    nbp, nt, nf, nc = x.shape
    nb = nbp // npair
    skip = x
    rngs = ([None] * 4 if rng is None else list(jax.random.split(rng, 4)))
    x = _fnblock_mean(params["block_1"], x, skip, npair=npair,
                      is_online=cfg.is_online,
                      drop=cfg.dropout, rngs=rngs[:2], training=training)
    x = _fnblock_mean(params["block_2"], x, skip, npair=npair,
                      is_online=cfg.is_online,
                      drop=cfg.dropout, rngs=rngs[2:], training=training)
    x = jnp.transpose(x, (0, 3, 2, 1))
    nt2 = nt // POOL
    x, _ = _caus_cnn(params["conv"], x, None)
    x = jnp.transpose(x, (0, 3, 2, 1)).reshape(nbp, nt2, nf, 2, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    x = x.reshape(nb, npair, nt2, -1, nf * 2)
    return jnp.transpose(x, (0, 2, 4, 1, 3))
