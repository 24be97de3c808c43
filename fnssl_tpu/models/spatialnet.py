"""OnlineSpatialNet (IPDnet2): Mamba-based spatial network with frequency
and time compression.

TPU-native re-implementation of IPDnet2/IPDnet2.py:23-431:
  * causal conv encoder (k=5) over each frequency's time stream;
  * 8 SpatialNetLayers: per-layer {LN→grouped freq Conv1d→PReLU} ×2, a
    full-band module (squeeze 1×1 conv+SiLU → Linear over frequency →
    unsqueeze+SiLU), and two Mamba time modules — layer 0 compresses
    frequency 256→128→16 (AvgPool ×2 between the fconvs, ×8 after) and is
    followed by 5× time pooling;
  * FreqInverse decoder (shared 1×1 conv expanding 16 bands → 256 bins,
    tanh) → Linear(16,16) → the reference's output reshape chain to
    (nb, nt/5, 2·nf, nmic-1, 2 tracks).

Flagship config (run_IPDnet2.py:103-119): dim_input 10 (5 mics re+im),
dim_output 16, hidden 96, squeeze 8, 8 layers, attention='mamba(16,4)'.
Parameters use the reference state_dict names (layers.0.fconv1.1.weight,
mhsa.in_proj.weight, ...) for lossless checkpoint conversion.

Streaming: ``spatialnet_apply(..., state=..., return_state=True)`` carries
the encoder conv tail and every Mamba state; chunks must be multiples of
the 5× time compression. The reference streams by a python per-frame
InferenceParams loop (IPDnet2.py:170-177); here the same recurrence runs
as a single ``lax.scan`` per chunk.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fnssl_tpu.models.layers import init_linear_params, linear
from fnssl_tpu.models.mamba import (
    MambaConfig, MambaState, init_mamba_params, init_mamba_state,
    mamba_apply, mamba_step)


class SpatialNetConfig(NamedTuple):
    dim_input: int = 10
    dim_output: int = 16
    num_layers: int = 8
    dim_squeeze: int = 8
    num_freqs: int = 256
    encoder_kernel_size: int = 5
    dim_hidden: int = 96
    d_state: int = 16
    mamba_conv: int = 4
    conv_groups: int = 8
    f_kernel_size: int = 5
    fre_compression_ratio: int = 16
    time_compression_ratio: int = 5
    time_compression_layer: int = 0

    @property
    def mamba_cfg(self) -> MambaConfig:
        return MambaConfig(self.dim_hidden, self.d_state, self.mamba_conv)


class SpatialNetState(NamedTuple):
    encoder_tail: jax.Array                 # (B·F, dim_input, k-1)
    mamba: tuple                            # ((mhsa, tconvffn), ...) per layer


def _init_ln(dim):
    return {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def _layer_norm(p, x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * p["weight"] + p["bias"]


def init_spatialnet_params(key: jax.Array,
                           cfg: SpatialNetConfig = SpatialNetConfig()):
    import math

    h, g, kf = cfg.dim_hidden, cfg.conv_groups, cfg.f_kernel_size

    def conv1d_init(k, out_ch, in_ch_per_group, kernel):
        fan_in = in_ch_per_group * kernel
        bound = 1.0 / math.sqrt(fan_in)
        kw, kb = jax.random.split(k)
        return {"weight": jax.random.uniform(
            kw, (out_ch, in_ch_per_group, kernel), jnp.float32,
            -bound, bound),
            "bias": jax.random.uniform(kb, (out_ch,), jnp.float32,
                                       -bound, bound)}

    def fconv(k):
        k1, k2 = jax.random.split(k)
        return {"0": _init_ln(h), "1": conv1d_init(k1, h, h // g, kf),
                "2": {"weight": jnp.full((h,), 0.25)}}

    def layer(k, nfreq):
        ks = jax.random.split(k, 8)
        return {
            "fconv1": fconv(ks[0]),
            "norm_full": _init_ln(h),
            "squeeze": {"0": conv1d_init(ks[1], cfg.dim_squeeze, h, 1)},
            "full": init_linear_params(ks[2], nfreq, nfreq),
            "unsqueeze": {"0": conv1d_init(ks[3], h, cfg.dim_squeeze, 1)},
            "fconv2": fconv(ks[4]),
            "norm_mhsa": _init_ln(h),
            "mhsa": init_mamba_params(ks[5], cfg.mamba_cfg),
            "norm_tconvffn": _init_ln(h),
            "tconvffn": init_mamba_params(ks[6], cfg.mamba_cfg),
        }

    ks = jax.random.split(key, cfg.num_layers + 3)
    layers = {}
    for i in range(cfg.num_layers):
        nfreq = (cfg.num_freqs // 2 if i == 0
                 else cfg.num_freqs // cfg.fre_compression_ratio)
        layers[str(i)] = layer(ks[i], nfreq)
    return {
        "encoder": conv1d_init(ks[-3], h, cfg.dim_input,
                               cfg.encoder_kernel_size),
        "layers": layers,
        "freq_inverse": {"trans2": conv1d_init(
            ks[-2], cfg.fre_compression_ratio * cfg.dim_output, h, 1)},
        "decoder": init_linear_params(ks[-1], cfg.dim_output,
                                      cfg.dim_output),
    }


def init_spatialnet_state(nb: int, cfg: SpatialNetConfig = SpatialNetConfig()
                          ) -> SpatialNetState:
    f_comp = cfg.num_freqs // cfg.fre_compression_ratio
    mamba_states = []
    for i in range(cfg.num_layers):
        batch = nb * f_comp
        mamba_states.append((init_mamba_state(batch, cfg.mamba_cfg),
                             init_mamba_state(batch, cfg.mamba_cfg)))
    return SpatialNetState(
        jnp.zeros((nb * cfg.num_freqs, cfg.dim_input,
                   cfg.encoder_kernel_size - 1), jnp.float32),
        tuple(mamba_states))


def _grouped_conv1d(p, x, groups: int, padding):
    """x: (B, C, L); torch Conv1d weight (out, in/groups, k)."""
    out = jax.lax.conv_general_dilated(
        x, p["weight"], window_strides=(1,), padding=[padding],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups)
    return out + p["bias"][None, :, None]


def _fconv(p, x, cfg):
    """x: (B, F, T, H) → LN(H) → grouped conv over F → PReLU. Matches
    _fconv at IPDnet2.py:222-232."""
    nb, f, t, h = x.shape
    y = _layer_norm(p["0"], x)                      # LN over H
    y = jnp.transpose(y, (0, 2, 3, 1)).reshape(nb * t, h, f)
    k = cfg.f_kernel_size
    y = _grouped_conv1d(p["1"], y, cfg.conv_groups,
                        ((k - 1) // 2, k // 2))
    a = p["2"]["weight"][None, :, None]
    y = jnp.where(y >= 0, y, a * y)                 # per-channel PReLU
    y = y.reshape(nb, t, h, f)
    return jnp.transpose(y, (0, 3, 1, 2))


def _full(p, x, cfg):
    """Full-band module (IPDnet2.py:235-253). x: (B, F, T, H)."""
    nb, f, t, h = x.shape
    y = _layer_norm(p["norm_full"], x)
    y = jnp.transpose(y, (0, 2, 3, 1)).reshape(nb * t, h, f)
    y = jax.nn.silu(_grouped_conv1d(p["squeeze"]["0"], y, 1, (0, 0)))
    y = linear(p["full"], y)                        # Linear over freq
    y = jax.nn.silu(_grouped_conv1d(p["unsqueeze"]["0"], y, 1, (0, 0)))
    y = y.reshape(nb, t, h, f)
    return jnp.transpose(y, (0, 3, 1, 2))


def _pool_freq(x, k):
    nb, f, t, h = x.shape
    y = jnp.transpose(x, (0, 2, 3, 1))              # (B, T, H, F)
    y = y[..., : f // k * k].reshape(nb, t, h, f // k, k).mean(-1)
    return jnp.transpose(y, (0, 3, 1, 2))


def _mamba_block(norm_p, mamba_p, x, cfg, state: MambaState | None):
    nb, f, t, h = x.shape
    y = _layer_norm(norm_p, x).reshape(nb * f, t, h)
    if state is None:
        y = mamba_apply(mamba_p, y, cfg.mamba_cfg)
        new_state = None
    else:
        y, new_state = mamba_step(mamba_p, y, cfg.mamba_cfg, state)
    return y.reshape(nb, f, t, h), new_state


@functools.partial(jax.jit, static_argnames=("cfg", "return_state"))
def spatialnet_apply(params, x: jax.Array, *,
                     cfg: SpatialNetConfig = SpatialNetConfig(),
                     state: SpatialNetState | None = None,
                     return_state: bool = False):
    """Forward. x: (nb, dim_input, nf, nt) — the run_IPDnet2 input layout.

    Returns (nb, nt/time_ratio, 2·nf, dim_output/4, 2). With ``state``,
    treats x as a continuation chunk (nt must be a multiple of the time
    compression ratio).
    """
    x = jnp.transpose(x, (0, 2, 3, 1))              # (B, F, T, H0)
    nb, f, t, h0 = x.shape
    # encoder: causal conv over time per (batch, freq) stream
    y = x.reshape(nb * f, t, h0)
    yt = jnp.swapaxes(y, 1, 2)                      # (B·F, H0, T)
    k = cfg.encoder_kernel_size
    if state is None:
        pad = jnp.zeros(yt.shape[:2] + (k - 1,), yt.dtype)
    else:
        pad = state.encoder_tail
    yin = jnp.concatenate([pad, yt], axis=-1)
    enc_tail = yin[..., -(k - 1):]
    y = _grouped_conv1d(params["encoder"], yin, 1, (0, 0))
    y = jnp.swapaxes(y, 1, 2)                       # (B·F, T, H)
    x = y.reshape(nb, f, t, cfg.dim_hidden)

    new_mamba = []
    for i in range(cfg.num_layers):
        p = params["layers"][str(i)]
        st = state.mamba[i] if state is not None else (None, None)
        x = x + _fconv(p["fconv1"], x, cfg)
        if i == 0:
            x = _pool_freq(x, 2)
        x = x + _full(p, x, cfg)
        x = x + _fconv(p["fconv2"], x, cfg)
        if i == 0:
            x = _pool_freq(x, cfg.fre_compression_ratio // 2)
        d1, s1 = _mamba_block(p["norm_mhsa"], p["mhsa"], x, cfg, st[0])
        x = x + d1
        d2, s2 = _mamba_block(p["norm_tconvffn"], p["tconvffn"], x, cfg,
                              st[1])
        x = x + d2
        new_mamba.append((s1, s2))
        if i == cfg.time_compression_layer:
            nb_, f_, t_, h_ = x.shape
            r = cfg.time_compression_ratio
            x = x[:, :, : t_ // r * r].reshape(
                nb_, f_, t_ // r, r, h_).mean(3)

    # FreqInverse decoder (IPDnet2.py:23-43)
    nb_, f16, t_, h = x.shape
    y = jnp.transpose(x, (0, 3, 2, 1))              # (B, H, T, F16)
    w = params["freq_inverse"]["trans2"]["weight"][:, :, 0]  # (cr·out, H)
    b = params["freq_inverse"]["trans2"]["bias"]
    cr = cfg.fre_compression_ratio
    out_dim = cfg.dim_output
    z = jnp.einsum("bhtf,oh->botf", y, w) + b[None, :, None, None]
    z = z.reshape(nb_, out_dim, cr, t_, f16)
    # out[b, o, i·cr + j, t] = z[b, o, j, t, i]
    z = jnp.transpose(z, (0, 1, 4, 2, 3)).reshape(nb_, out_dim,
                                                  f16 * cr, t_)
    z = jnp.tanh(jnp.transpose(z, (0, 1, 3, 2)))    # (B, out, T, F)
    z = jnp.transpose(z, (0, 3, 2, 1))              # (B, F, T, out)
    z = linear(params["decoder"], z)

    # output reshape chain (IPDnet2.py:360-364)
    bsz, f_, t2, _ = z.shape
    z = jnp.transpose(z, (0, 2, 1, 3)).reshape(bsz, t2, f_, 2, -1)
    z = jnp.transpose(z, (0, 1, 3, 2, 4))
    z = z.reshape(bsz, t2, 2, f_ * 2, -1)
    out = jnp.transpose(z, (0, 1, 3, 4, 2))
    if return_state:
        return out, SpatialNetState(enc_tail, tuple(new_mamba))
    return out
