"""MHSA time module, causal attention masks, and the T-ConvFFN block.

These are the OnlineSpatialNet time-module alternatives to Mamba that the
reference carries as dormant capability:

  * the MHSA branch of ``_tsa`` (IPDnet2/IPDnet2.py:183-202) —
    ``nn.MultiheadAttention(..., batch_first=True)`` driven by an additive
    causal mask;
  * ``get_causal_mask`` (IPDnet2/IPDnet2.py:370-399) — bounded look-back
    window of ``attn_scope`` frames, optionally with ALiBi per-head linear
    decay (slope 2^(-8/h) for head h = 1..H);
  * the conv feed-forward branch of ``_tconvffn`` (IPDnet2/IPDnet2.py:204-221)
    used when the second time module is not Mamba.  The reference ships only
    the dispatch loop (its constructor hardcodes Mamba), so the block
    structure here is our own: 1x1 expand -> SiLU -> grouped causal conv ->
    SiLU -> 1x1 project, each ``nn.Conv1d``-compatible so weights convert
    losslessly to an equivalent torch ``ModuleList``.

TPU-first notes: attention runs as one batched einsum chain over the
``nb*nf`` narrow-band sequences (MXU-friendly (T, T) score matmuls); the
mask is a trace-time constant.  Streaming uses a bounded key/value window —
valid because the mask never lets a query see further back than
``attn_scope - 1`` frames — which the reference cannot do at all (its MHSA
path has no incremental state).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MHSAConfig(NamedTuple):
    embed_dim: int
    num_heads: int
    attn_scope: int = 251     # 'mhsa(frames)' (IPDnet2.py:276)
    alibi: bool = False       # rope == 'ALiBi' (IPDnet2.py:372-377)


def alibi_slopes(num_heads: int) -> np.ndarray:
    """Per-head ALiBi slopes 2^(-8/h), h = 1..H (IPDnet2.py:372)."""
    return 2.0 ** (-8.0 / np.arange(1, num_heads + 1))


def causal_mask(slen: int, attn_scope: int, num_heads: int | None = None,
                alibi: bool = False) -> np.ndarray:
    """Additive attention mask of ``get_causal_mask`` (IPDnet2.py:381-399).

    relative_pos = i - j; a key is visible iff 0 <= i - j < attn_scope.
    Plain: (slen, slen) of {0, -inf}.  ALiBi: (num_heads, slen, slen) with
    slope_h * -(i - j) on visible entries (the reference tiles this over
    the batch; broadcasting is equivalent).
    """
    idx = np.arange(slen)
    rel = idx[:, None] - idx[None, :]
    visible = (rel >= 0) & (rel < attn_scope)
    if alibi:
        m = alibi_slopes(num_heads).reshape(num_heads, 1, 1)
        return np.where(visible, m * -np.abs(rel), -np.inf).astype(np.float32)
    return np.where(visible, 0.0, -np.inf).astype(np.float32)


def init_mhsa_params(key: jax.Array, cfg: MHSAConfig) -> dict:
    """torch ``nn.MultiheadAttention`` state_dict layout & init:
    xavier-uniform in_proj_weight, zero in_proj_bias/out_proj.bias,
    kaiming-uniform out_proj.weight (Linear default)."""
    e = cfg.embed_dim
    k1, k2 = jax.random.split(key)
    bound_in = math.sqrt(6.0 / (3 * e + e))
    bound_out = math.sqrt(1.0 / e) * math.sqrt(3.0)
    return {
        "in_proj_weight": jax.random.uniform(
            k1, (3 * e, e), jnp.float32, -bound_in, bound_in),
        "in_proj_bias": jnp.zeros((3 * e,)),
        "out_proj": {
            "weight": jax.random.uniform(
                k2, (e, e), jnp.float32, -bound_out, bound_out),
            "bias": jnp.zeros((e,))},
    }


def _qkv(params, x_q, x_kv, cfg: MHSAConfig):
    e, h = cfg.embed_dim, cfg.num_heads
    hd = e // h
    w, b = params["in_proj_weight"], params["in_proj_bias"]
    q = x_q @ w[:e].T + b[:e]
    k = x_kv @ w[e:2 * e].T + b[e:2 * e]
    v = x_kv @ w[2 * e:].T + b[2 * e:]

    def heads(t):
        bsz, tl, _ = t.shape
        return t.reshape(bsz, tl, h, hd).transpose(0, 2, 1, 3)

    return heads(q) * hd ** -0.5, heads(k), heads(v)


def _attend(params, q, k, v, mask, cfg: MHSAConfig):
    bsz = q.shape[0]
    scores = q @ jnp.swapaxes(k, -1, -2)            # (B, h, Tq, Tk)
    scores = scores + mask                           # (Tq,Tk) or (h,Tq,Tk)
    out = jax.nn.softmax(scores, axis=-1) @ v        # (B, h, Tq, hd)
    out = out.transpose(0, 2, 1, 3).reshape(bsz, q.shape[2], -1)
    return out @ params["out_proj"]["weight"].T + params["out_proj"]["bias"]


def mhsa_apply(params, x: jax.Array, mask: jax.Array,
               cfg: MHSAConfig) -> jax.Array:
    """One-shot self-attention on (B, T, H) with an additive mask,
    numerically matching ``nn.MultiheadAttention(batch_first=True)``."""
    q, k, v = _qkv(params, x, x, cfg)
    return _attend(params, q, k, v, mask, cfg)


class MHSAState(NamedTuple):
    tail: jax.Array     # (B, attn_scope-1, H) last window of inputs
    pos: jax.Array      # () int32 — frames consumed so far


def init_mhsa_state(batch: int, cfg: MHSAConfig) -> MHSAState:
    return MHSAState(
        jnp.zeros((batch, max(cfg.attn_scope - 1, 0), cfg.embed_dim),
                  jnp.float32),
        jnp.zeros((), jnp.int32))


def mhsa_apply_streaming(params, x: jax.Array, cfg: MHSAConfig,
                         state: MHSAState):
    """Chunked streaming attention, bit-equal to the one-shot path.

    The bounded-scope mask means frame i only reads frames
    (i-attn_scope, i]; carrying the last attn_scope-1 raw inputs and
    recomputing their K/V per chunk (rematerialization over HBM residency)
    reproduces the one-shot result exactly.
    """
    bsz, t, e = x.shape
    w = max(cfg.attn_scope - 1, 0)
    ctx = jnp.concatenate([state.tail, x], axis=1)   # (B, w+T, H)
    q, k, v = _qkv(params, x, ctx, cfg)
    # query i attends ctx j: rel = i + w - j; visible iff 0<=rel<scope AND
    # ctx j is a real frame (its global index state.pos - w + j >= 0).
    i = np.arange(t)[:, None]
    j = np.arange(w + t)[None, :]
    rel = i + w - j
    visible = (rel >= 0) & (rel < cfg.attn_scope)
    real = (state.pos - w + j) >= 0                  # traced
    if cfg.alibi:
        m = jnp.asarray(alibi_slopes(cfg.num_heads).reshape(-1, 1, 1),
                        jnp.float32)
        base = m * jnp.asarray(-np.abs(rel), jnp.float32)
    else:
        base = jnp.zeros(rel.shape, jnp.float32)
    mask = jnp.where(jnp.asarray(visible) & real, base, -jnp.inf)
    out = _attend(params, q, k, v, mask, cfg)
    new_tail = ctx[:, ctx.shape[1] - w:] if w else state.tail
    return out, MHSAState(new_tail, state.pos + t)


# ---------------------------------------------------------------------------
# T-ConvFFN (the non-Mamba second time module)


class TConvFFNConfig(NamedTuple):
    dim_hidden: int
    kernel_size: int = 3      # kernel_size[1] of the reference layer args
    groups: int = 8           # conv_groups[1]
    factor: int = 2           # hidden expansion


def init_tconvffn_params(key: jax.Array, cfg: TConvFFNConfig) -> dict:
    """ModuleList-indexed keys ("0","1","3","5") converting 1:1 to a torch
    ``ModuleList([LayerNorm(seq_last=True), Conv1d, SiLU, CausalConv1d,
    SiLU, Conv1d])`` driven by the reference's ``_tconvffn`` loop
    (IPDnet2.py:204-221; norm applied via its plain ``x = m(x)`` branch)."""
    h, f, k = cfg.dim_hidden, cfg.factor, cfg.kernel_size

    def conv_init(rk, out_ch, in_ch_per_group, kernel):
        fan_in = in_ch_per_group * kernel
        bound = 1.0 / math.sqrt(fan_in)
        kw, kb = jax.random.split(rk)
        return {"weight": jax.random.uniform(
            kw, (out_ch, in_ch_per_group, kernel), jnp.float32,
            -bound, bound),
            "bias": jax.random.uniform(kb, (out_ch,), jnp.float32,
                                       -bound, bound)}

    ks = jax.random.split(key, 3)
    return {"0": {"weight": jnp.ones((h,)), "bias": jnp.zeros((h,))},
            "1": conv_init(ks[0], h * f, h, 1),
            "3": conv_init(ks[1], h * f, h * f // cfg.groups, k),
            "5": conv_init(ks[2], h, h * f, 1)}


def _conv1d(p, x, groups, padding):
    out = jax.lax.conv_general_dilated(
        x, p["weight"], window_strides=(1,), padding=[padding],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups)
    return out + p["bias"][None, :, None]


def tconvffn_apply(params, x: jax.Array, cfg: TConvFFNConfig,
                   state: jax.Array | None = None):
    """x: (B, T, H) -> (B, T, H); optional causal-conv tail state
    (B, H*factor, k-1) for streaming (CausalConv1d semantics,
    IPDnet2.py:66-76). LN (over H) is the first ModuleList element."""
    ln = params["0"]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + 1e-5) * ln["weight"] + ln["bias"]
    y = jnp.swapaxes(y, 1, 2)                        # (B, H, T)
    y = jax.nn.silu(_conv1d(params["1"], y, 1, (0, 0)))
    k = cfg.kernel_size
    if state is None:
        y = jax.nn.silu(_conv1d(params["3"], y, cfg.groups, (k - 1, 0)))
        new_state = None
    else:
        yin = jnp.concatenate([state, y], axis=-1)
        new_state = yin[..., yin.shape[-1] - (k - 1):]
        y = jax.nn.silu(_conv1d(params["3"], yin, cfg.groups, (0, 0)))
    y = _conv1d(params["5"], y, 1, (0, 0))
    out = jnp.swapaxes(y, 1, 2)
    return (out, new_state) if state is not None else out


def init_tconvffn_state(batch: int, cfg: TConvFFNConfig) -> jax.Array:
    return jnp.zeros((batch, cfg.dim_hidden * cfg.factor,
                      cfg.kernel_size - 1), jnp.float32)
