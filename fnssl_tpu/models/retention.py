"""Multi-scale retention (RetNet) with three equivalent execution modes.

Parity: IPDnet2/arch/base/retention.py — parallel (:160-172), per-step
recurrent with rescaled kv state (:174-192), and chunkwise-recurrent with
cross-chunk scale alignment (:194-255); RetNetRelPos decay/rotary tables
(:36-104); xpos ``theta_shift`` (:107-116). The reference's own
three-mode allclose self-test (:303-326) is reproduced in tests and also
run against this implementation via converted weights.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def rms_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)


class RetNetRelPos:
    """Decay + rotary tables (host-precomputed numpy, jit-consumed)."""

    def __init__(self, embed_dim: int, num_heads: int,
                 recurrent_chunk_size: int, decay=None):
        angle = 1.0 / (10000 ** np.linspace(0, 1,
                                            embed_dim // num_heads // 2))
        self.angle = np.repeat(angle, 2)
        if decay is False:
            decays = [1.0] * num_heads
        elif isinstance(decay, (list, tuple)):
            if isinstance(decay[0], float):
                decays = list(decay)
            else:
                decays = [1 - 2.0 ** (-d) for d in decay]
        else:
            d0 = 5 if (decay is None or decay is True) else decay
            decays = (1 - 2.0 ** (-d0 - np.arange(num_heads,
                                                  dtype=np.float64)))
        self.decays = list(np.asarray(decays, np.float64))
        self.decay = np.log(np.asarray(self.decays, np.float32))
        self.recurrent_chunk_size = recurrent_chunk_size

    def __call__(self, slen: int, activate_recurrent: bool = False,
                 chunkwise_recurrent: bool = False):
        if activate_recurrent:
            cos = np.cos(self.angle * (slen - 1))
            sin = np.sin(self.angle * (slen - 1))
            return ((jnp.asarray(sin, jnp.float32),
                     jnp.asarray(cos, jnp.float32)),
                    jnp.asarray(np.exp(self.decay), jnp.float32))
        index = np.arange(slen)
        sin = np.sin(index[:, None] * self.angle[None, :]).astype(np.float32)
        cos = np.cos(index[:, None] * self.angle[None, :]).astype(np.float32)
        if chunkwise_recurrent:
            cs = self.recurrent_chunk_size
            bi = np.arange(cs, dtype=np.float64)
            tri = np.tril(np.ones((cs, cs)))
            diffs = np.where(tri > 0, bi[:, None] - bi[None, :], np.inf)
            mask = np.exp(diffs[None] * self.decay[:, None, None]
                          .astype(np.float64))
            mask = np.nan_to_num(mask)
            value_inner_decay = (mask[:, -1]
                                 / mask[:, -1].sum(-1, keepdims=True))
            value_inner_decay = value_inner_decay[:, :, None]
            scale = np.sqrt(mask.sum(-1, keepdims=True))
            inner_mask = mask / scale
            cross_decay = np.exp(self.decay.astype(np.float64) * cs)
            query_inner_decay = np.exp(
                self.decay[:, None].astype(np.float64) * (bi + 1))
            query_inner_decay = query_inner_decay[:, :, None] / (
                scale / mask[:, -1].sum(-1)[:, None, None])
            f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
            return ((f32(sin), f32(cos)),
                    (f32(inner_mask), f32(cross_decay[:, None, None]),
                     f32(query_inner_decay), f32(value_inner_decay)))
        tri = np.tril(np.ones((slen, slen)))
        diffs = np.where(tri > 0,
                         index[:, None] - index[None, :], np.inf)
        mask = np.exp(diffs[None] * self.decay[:, None, None]
                      .astype(np.float64))
        mask = np.nan_to_num(mask)
        mask = mask / np.sqrt(mask.sum(-1, keepdims=True))
        return ((jnp.asarray(sin), jnp.asarray(cos)),
                jnp.asarray(mask, jnp.float32))


def _rotate_every_two(x):
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def theta_shift(x, sin, cos):
    """xpos rotary. Accepts (T, kd) tables (parallel/chunkwise) or (kd,)
    single-step values (recurrent). NB the reference's recurrent path
    slices a 1-D table as ``cos[:slen]`` — broadcasting only the first
    angle component (retention.py:115) — and queries the table at t-1;
    we apply the intended full-vector rotary so the three modes agree."""
    if sin.ndim == 1:
        return x * cos + _rotate_every_two(x) * sin
    slen = x.shape[-2]
    return x * cos[..., :slen, :] + _rotate_every_two(x) * sin[..., :slen, :]


class RetentionConfig(NamedTuple):
    embed_dim: int
    num_heads: int
    value_factor: int = 2
    share_qk: bool = False
    look_ahead: int = 0

    @property
    def value_dim(self):
        return self.embed_dim * self.value_factor

    @property
    def head_dim(self):
        return self.value_dim // self.num_heads

    @property
    def key_dim(self):
        return self.embed_dim // self.num_heads


def init_retention_params(key: jax.Array, cfg: RetentionConfig) -> dict:
    ks = jax.random.split(key, 5)

    def xavier(k, shape, gain):
        std = gain * math.sqrt(2.0 / (shape[0] + shape[1]))
        bound = math.sqrt(3.0) * std
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    e, v = cfg.embed_dim, cfg.value_dim
    params = {
        "q_proj": {"weight": xavier(ks[0], (e, e), 2 ** -2.5)},
        "v_proj": {"weight": xavier(ks[2], (v, e), 2 ** -2.5)},
        "g_proj": {"weight": xavier(ks[3], (v, e), 2 ** -2.5)},
        "out_proj": {"weight": xavier(ks[4], (e, v), 2 ** -1)},
    }
    if not cfg.share_qk:
        params["k_proj"] = {"weight": xavier(ks[1], (e, e), 2 ** -2.5)}
    return params


def _qkvg(params, x, cfg: RetentionConfig, sin, cos, rope: bool):
    bsz, tgt_len, _ = x.shape
    q = x @ params["q_proj"]["weight"].T
    v = x @ params["v_proj"]["weight"].T
    g = x @ params["g_proj"]["weight"].T
    q = q.reshape(bsz, tgt_len, cfg.num_heads, cfg.key_dim
                  ).transpose(0, 2, 1, 3)
    if cfg.share_qk:
        k = q
    else:
        k = (x @ params["k_proj"]["weight"].T) * cfg.key_dim ** -0.5
        k = k.reshape(bsz, tgt_len, cfg.num_heads, cfg.key_dim
                      ).transpose(0, 2, 1, 3)
    qr = theta_shift(q, sin, cos) if rope else q
    kr = theta_shift(k, sin, cos) if rope else k
    return qr, kr, v, g


def retention_parallel(params, x, rel_pos, cfg: RetentionConfig,
                       rope: bool = True):
    """Parallel mode (retention.py:160-172)."""
    (sin, cos), mask = rel_pos
    bsz, tgt_len, _ = x.shape
    qr, kr, v, g = _qkvg(params, x, cfg, sin, cos, rope)
    if cfg.look_ahead > 0:
        la = cfg.look_ahead
        kr = jnp.pad(kr, ((0, 0), (0, 0), (0, la), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, la), (0, 0)))
        qr = jnp.pad(qr, ((0, 0), (0, 0), (la, 0), (0, 0)))
    vr = v.reshape(bsz, v.shape[1], cfg.num_heads, cfg.head_dim
                   ).transpose(0, 2, 1, 3)
    qk = (qr @ jnp.swapaxes(kr, -1, -2)) * mask
    denom = jnp.clip(jnp.sum(jnp.abs(qk), axis=-1, keepdims=True),
                     1.0, 5e4)
    out = (qk / denom) @ vr
    out = out.transpose(0, 2, 1, 3)
    if cfg.look_ahead > 0:
        out = out[:, :-cfg.look_ahead]
    out = rms_norm(out).reshape(bsz, tgt_len, -1)
    out = jax.nn.silu(g) * out
    return out @ params["out_proj"]["weight"].T


def retention_recurrent_step(params, x, rel_pos, cfg: RetentionConfig,
                             state: dict | None, rope: bool = True):
    """Single-frame recurrent mode (retention.py:174-192).
    state: {'prev_key_value': (b, h, kd, hd), 'scale': (h,)} or None."""
    (sin, cos), decay = rel_pos
    bsz = x.shape[0]
    qr, kr, v, g = _qkvg(params, x, cfg, sin, cos, rope)
    # kv[b,h,kd,hd] = kr[b,h,0,kd]·v[b,h,hd] (retention.py:176-178)
    kv = kr.reshape(bsz, cfg.num_heads, cfg.key_dim, 1) \
        * v.reshape(bsz, cfg.num_heads, 1, cfg.head_dim)
    if state is not None and "prev_key_value" in state:
        prev_kv = state["prev_key_value"]
        prev_scale = state["scale"]
        scale = prev_scale * decay + 1
        kv = prev_kv * (jnp.sqrt(prev_scale) * decay / jnp.sqrt(scale)
                        ).reshape(cfg.num_heads, 1, 1) \
            + kv / jnp.sqrt(scale).reshape(cfg.num_heads, 1, 1)
    else:
        scale = jnp.ones_like(decay)
    new_state = {"prev_key_value": kv, "scale": scale}
    qr3 = qr.reshape(bsz, cfg.num_heads, cfg.key_dim, 1)
    out = jnp.sum(qr3 * kv, axis=2)      # (b, h, hd)
    out = rms_norm(out).reshape(bsz, 1, -1)
    out = jax.nn.silu(g) * out
    return out @ params["out_proj"]["weight"].T, new_state


def retention_chunkwise(params, x, rel_pos, cfg: RetentionConfig,
                        rope: bool = True):
    """Chunkwise-recurrent mode (retention.py:194-255)."""
    (sin, cos), (mask, cross_decay, query_inner_decay,
                 value_inner_decay) = rel_pos
    bsz, tgt_len0, _ = x.shape
    qr, kr, v, g = _qkvg(params, x, cfg, sin, cos, rope)
    if cfg.look_ahead > 0:
        la = cfg.look_ahead
        kr = jnp.pad(kr, ((0, 0), (0, 0), (0, la), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, la), (0, 0)))
        qr = jnp.pad(qr, ((0, 0), (0, 0), (la, 0), (0, 0)))
    tgt_len = v.shape[1]
    chunk_len = mask.shape[1]
    pad = (-tgt_len) % chunk_len
    if pad:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kr = jnp.pad(kr, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    padded_len = v.shape[1]
    nchunk = padded_len // chunk_len
    h, kd, hd = cfg.num_heads, cfg.key_dim, cfg.head_dim
    qr = qr.reshape(bsz, h, nchunk, chunk_len, kd).transpose(0, 2, 1, 3, 4)
    kr = kr.reshape(bsz, h, nchunk, chunk_len, kd).transpose(0, 2, 1, 3, 4)
    v = v.reshape(bsz, nchunk, chunk_len, h, hd).transpose(0, 1, 3, 2, 4)

    kr_t = jnp.swapaxes(kr, -1, -2)
    qk = (qr @ kr_t) * mask
    inner_scale = jnp.clip(jnp.sum(jnp.abs(qk), -1, keepdims=True), 1.0)
    inner_output = (qk / inner_scale) @ v

    kv = kr_t @ (v * value_inner_decay)  # (b, nchunk, h, kd, hd)

    def scan_fn(carry, kv_i):
        kv_state, kv_scale = carry
        rec = kv_state / kv_scale
        scale_out = kv_scale
        kv_state = kv_state * cross_decay + kv_i
        kv_scale = jnp.clip(
            jnp.max(jnp.sum(jnp.abs(kv_state), -2, keepdims=True), -1,
                    keepdims=True), 1.0)
        return (kv_state, kv_scale), (rec, scale_out)

    kv_t = jnp.swapaxes(kv, 0, 1)        # (nchunk, b, h, kd, hd)
    init = (jnp.zeros((bsz, h, kd, hd), v.dtype),
            jnp.ones((bsz, h, 1, 1), v.dtype))
    _, (kv_rec, cross_scale) = jax.lax.scan(scan_fn, init, kv_t)
    kv_rec = jnp.swapaxes(kv_rec, 0, 1)
    cross_scale = jnp.swapaxes(cross_scale, 0, 1)

    all_scale = jnp.maximum(inner_scale, cross_scale)
    cross_output = (qr * query_inner_decay) @ kv_rec
    output = (inner_output / (all_scale / inner_scale)
              + cross_output / (all_scale / cross_scale))
    output = jnp.swapaxes(output, 2, 3)  # (b, nchunk, chunk, h, hd)
    output = output.reshape(bsz, padded_len, h, hd)
    out_len = tgt_len0 + (cfg.look_ahead if cfg.look_ahead > 0 else 0)
    output = output[:, :out_len]
    if cfg.look_ahead > 0:
        output = output[:, :-cfg.look_ahead]
    out = rms_norm(output).reshape(bsz, tgt_len0, -1)
    out = jax.nn.silu(g) * out
    return out @ params["out_proj"]["weight"].T
