"""OnlineSpatialNet (IPDnet2): spatial network with frequency and time
compression and selectable time modules (Mamba / MHSA / RetNet retention).

TPU-native re-implementation of IPDnet2/IPDnet2.py:23-431:
  * causal conv encoder (k=5) over each frequency's time stream;
  * 8 SpatialNetLayers: per-layer {LN→grouped freq Conv1d→PReLU} ×2, a
    full-band module (squeeze 1×1 conv+SiLU → Linear over frequency →
    unsqueeze+SiLU), and two time modules — layer 0 compresses frequency
    256→128→16 (AvgPool ×2 between the fconvs, ×8 after) and is followed
    by 5× time pooling;
  * FreqInverse decoder (shared 1×1 conv expanding 16 bands → 256 bins,
    tanh) → Linear(16,16) → the reference's output reshape chain to
    (nb, nt/5, 2·nf, nmic-1, 2 tracks).

Time-module selection mirrors the reference's ``attention=`` string
(IPDnet2.py:276 'mhsa(frames), ret(factor)'; flagship 'mamba(16,4)',
run_IPDnet2.py:114):
  * ``mamba(d_state,d_conv)`` — both time modules are Mamba blocks
    (the only path reachable from the shipped constructor,
    IPDnet2.py:125-133);
  * ``mhsa(scope)`` — multi-head self-attention with the
    ``get_causal_mask`` semantics (IPDnet2.py:370-399): causal bounded
    look-back of ``scope`` frames, ALiBi per-head decay when
    ``rope='ALiBi'``; second module = T-ConvFFN (the reference's
    ``_tconvffn`` dispatch branch, IPDnet2.py:204-221);
  * ``ret(factor)`` — MultiScaleRetention (models/retention.py) with
    RetNetRelPos decay/rotary tables; ``chunkwise_recurrent`` selects the
    chunkwise vs parallel one-shot mode exactly as the plumb-through at
    IPDnet2.py:337-344; second module = T-ConvFFN.

Parameters use the reference state_dict names (layers.0.fconv1.1.weight,
mhsa.in_proj_weight, mhsa.q_proj.weight, ...) for lossless checkpoint
conversion.

Streaming: ``spatialnet_apply(..., state=..., return_state=True)`` carries
the encoder conv tail and every time-module state (Mamba ssm state, MHSA
bounded K/V window, retention rescaled kv state, T-ConvFFN conv tail);
chunks must be multiples of the 5× time compression. The reference streams
Mamba/retention by python per-frame loops (IPDnet2.py:170-177, 193-199)
and cannot stream MHSA at all; here each runs as a single batched chunk
computation (``lax.scan`` for the recurrences).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fnssl_tpu.models.attention import (
    MHSAConfig, MHSAState, TConvFFNConfig, causal_mask, init_mhsa_params,
    init_mhsa_state, init_tconvffn_params, init_tconvffn_state, mhsa_apply,
    mhsa_apply_streaming, tconvffn_apply)
from fnssl_tpu.models.layers import init_linear_params, linear
from fnssl_tpu.models.mamba import (
    MambaConfig, MambaState, init_mamba_params, init_mamba_state,
    mamba_apply, mamba_step)
from fnssl_tpu.models.retention import (
    RetentionConfig, RetNetRelPos, init_retention_params,
    retention_chunkwise, retention_parallel, retention_recurrent_step)


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
    # time-module selection (IPDnet2.py:276; 'mamba' uses d_state/mamba_conv
    # above unless given inline as 'mamba(d_state,d_conv)')
    attention: str = "mamba"
    num_heads: int = 4
    rope: bool | str = False          # retention rotary | 'ALiBi' for mhsa
    chunkwise_recurrent: bool = True
    recurrent_chunk_size: int = 20
    t_kernel_size: int = 3            # T-ConvFFN kernel (kernel_size[1])
    t_conv_groups: int = 8            # T-ConvFFN groups (conv_groups[1])
    tconvffn_factor: int = 2

    @property
    def time_kind(self) -> str:
        for kind in ("mamba", "mhsa", "ret"):
            if self.attention.startswith(kind):
                return kind
        raise ValueError(f"unknown attention {self.attention!r}")

    def _attn_args(self):
        a = self.attention
        if "(" not in a:
            return ()
        return tuple(int(v) for v in a[a.index("(") + 1:-1].split(","))

    @property
    def attn_scope(self) -> int:
        args = self._attn_args()
        return args[0] if args else 251          # 'mhsa(251)' default

    @property
    def ret_factor(self) -> int:
        args = self._attn_args()
        return args[0] if args else 2

    @property
    def mamba_cfg(self) -> MambaConfig:
        ds, dc = self.d_state, self.mamba_conv
        args = self._attn_args()
        if self.time_kind == "mamba" and len(args) == 2:
            ds, dc = args
        return MambaConfig(self.dim_hidden, ds, dc)

    @property
    def mhsa_cfg(self) -> MHSAConfig:
        return MHSAConfig(self.dim_hidden, self.num_heads, self.attn_scope,
                          alibi=self.rope == "ALiBi")

    @property
    def ret_cfg(self) -> RetentionConfig:
        return RetentionConfig(self.dim_hidden, self.num_heads,
                               self.ret_factor)

    @property
    def tconv_cfg(self) -> TConvFFNConfig:
        return TConvFFNConfig(self.dim_hidden, self.t_kernel_size,
                              self.t_conv_groups, self.tconvffn_factor)


class RetentionState(NamedTuple):
    kv: jax.Array       # (B·F, heads, key_dim, head_dim) rescaled kv
    scale: jax.Array    # (heads,) running scale
    pos: jax.Array      # () int32 absolute frame index (rotary phase)


class SpatialNetState(NamedTuple):
    encoder_tail: jax.Array    # (B·F, dim_input, k-1)
    time: tuple                # ((mod1_state, mod2_state), ...) per layer


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
    kind = cfg.time_kind

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
                # explicit dtype: a weak-typed init changes the jit
                # signature after one optimizer step (full recompile)
                "2": {"weight": jnp.full((h,), 0.25, jnp.float32)}}

    def time_module(k, slot: int):
        if kind == "mamba":
            return init_mamba_params(k, cfg.mamba_cfg)
        if slot == 1:                       # second module: T-ConvFFN
            return init_tconvffn_params(k, cfg.tconv_cfg)
        if kind == "mhsa":
            return init_mhsa_params(k, cfg.mhsa_cfg)
        return init_retention_params(k, cfg.ret_cfg)

    def layer(k, nfreq):
        ks = jax.random.split(k, 8)
        out = {
            "fconv1": fconv(ks[0]),
            "norm_full": _init_ln(h),
            "squeeze": {"0": conv1d_init(ks[1], cfg.dim_squeeze, h, 1)},
            "full": init_linear_params(ks[2], nfreq, nfreq),
            "unsqueeze": {"0": conv1d_init(ks[3], h, cfg.dim_squeeze, 1)},
            "fconv2": fconv(ks[4]),
            "norm_mhsa": _init_ln(h),
            "mhsa": time_module(ks[5], 0),
            "tconvffn": time_module(ks[6], 1),
        }
        if kind == "mamba":
            # non-mamba T-ConvFFN carries its norm as ModuleList element 0
            out["norm_tconvffn"] = _init_ln(h)
        return out

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
    kind = cfg.time_kind
    rc = cfg.ret_cfg
    states = []
    for i in range(cfg.num_layers):
        batch = nb * f_comp
        if kind == "mamba":
            states.append((init_mamba_state(batch, cfg.mamba_cfg),
                           init_mamba_state(batch, cfg.mamba_cfg)))
            continue
        if kind == "mhsa":
            s1 = init_mhsa_state(batch, cfg.mhsa_cfg)
        else:
            s1 = RetentionState(
                jnp.zeros((batch, rc.num_heads, rc.key_dim, rc.head_dim),
                          jnp.float32),
                jnp.zeros((rc.num_heads,), jnp.float32),
                jnp.zeros((), jnp.int32))
        states.append((s1, init_tconvffn_state(batch, cfg.tconv_cfg)))
    return SpatialNetState(
        jnp.zeros((nb * cfg.num_freqs, cfg.dim_input,
                   cfg.encoder_kernel_size - 1), jnp.float32),
        tuple(states))


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
    # the ssm scan runs fp32 internally; keep the residual stream in the
    # compute dtype (bf16 under the mixed-precision policy)
    return y.astype(x.dtype).reshape(nb, f, t, h), new_state


def get_causal_mask(cfg: SpatialNetConfig, slen: int):
    """Trace-time mask/rel-pos tables (get_causal_mask, IPDnet2.py:370-399).

    mhsa → additive (slen, slen) {0,-inf} window mask, or per-head ALiBi
    (heads, slen, slen) when rope='ALiBi'.  ret → RetNetRelPos decay/rotary
    tables in chunkwise or parallel layout.  mamba needs no mask (None).
    """
    kind = cfg.time_kind
    if kind == "mamba":
        return None
    if kind == "mhsa":
        return jnp.asarray(causal_mask(
            slen, cfg.attn_scope, cfg.num_heads,
            alibi=cfg.rope == "ALiBi"))
    pos = RetNetRelPos(cfg.dim_hidden, cfg.num_heads,
                       cfg.recurrent_chunk_size)
    return pos(slen, chunkwise_recurrent=cfg.chunkwise_recurrent)


def _retention_stream(params, y, cfg: SpatialNetConfig,
                      state: RetentionState):
    """Per-frame recurrent retention over a chunk (lax.scan), numerically
    equivalent to the chunkwise/parallel one-shot modes (the reference's
    per-step loop, IPDnet2.py:193-199 + retention.py:174-192)."""
    rc = cfg.ret_cfg
    pos_tab = RetNetRelPos(cfg.dim_hidden, cfg.num_heads,
                           cfg.recurrent_chunk_size)
    angle = jnp.asarray(pos_tab.angle, jnp.float32)
    decay = jnp.asarray(np.exp(pos_tab.decay), jnp.float32)
    rope = cfg.rope is True

    def step(carry, yt):
        kv, scale, pos = carry
        ang = angle * pos.astype(jnp.float32)
        rel = ((jnp.sin(ang), jnp.cos(ang)), decay)
        out, new = retention_recurrent_step(
            params, yt[:, None, :], rel, rc,
            {"prev_key_value": kv, "scale": scale}, rope=rope)
        return (new["prev_key_value"], new["scale"], pos + 1), out[:, 0, :]

    carry0 = (state.kv, state.scale, state.pos)
    (kv, scale, pos), outs = jax.lax.scan(
        step, carry0, jnp.swapaxes(y, 0, 1))
    return jnp.swapaxes(outs, 0, 1), RetentionState(kv, scale, pos)


def _time_block_1(p, x, cfg: SpatialNetConfig, mask, state):
    """First time module: Mamba / MHSA / retention on (B,F,T,H)."""
    kind = cfg.time_kind
    if kind == "mamba":
        return _mamba_block(p["norm_mhsa"], p["mhsa"], x, cfg, state)
    nb, f, t, h = x.shape
    y = _layer_norm(p["norm_mhsa"], x).reshape(nb * f, t, h)
    if kind == "mhsa":
        if state is None:
            y = mhsa_apply(p["mhsa"], y, mask, cfg.mhsa_cfg)
            new_state = None
        else:
            y, new_state = mhsa_apply_streaming(p["mhsa"], y, cfg.mhsa_cfg,
                                                state)
    else:
        rope = cfg.rope is True
        if state is None:
            if cfg.chunkwise_recurrent:
                y = retention_chunkwise(p["mhsa"], y, mask, cfg.ret_cfg,
                                        rope=rope)
            else:
                y = retention_parallel(p["mhsa"], y, mask, cfg.ret_cfg,
                                       rope=rope)
            new_state = None
        else:
            y, new_state = _retention_stream(p["mhsa"], y, cfg, state)
    return y.reshape(nb, f, t, h), new_state


def _time_block_2(p, x, cfg: SpatialNetConfig, state):
    """Second time module: Mamba (mamba mode) or T-ConvFFN (whose LN is
    its own ModuleList element 0, per the _tconvffn dispatch)."""
    if cfg.time_kind == "mamba":
        return _mamba_block(p["norm_tconvffn"], p["tconvffn"], x, cfg,
                            state)
    nb, f, t, h = x.shape
    y = x.reshape(nb * f, t, h)
    if state is None:
        y = tconvffn_apply(p["tconvffn"], y, cfg.tconv_cfg)
        new_state = None
    else:
        y, new_state = tconvffn_apply(p["tconvffn"], y, cfg.tconv_cfg,
                                      state=state)
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

    Masks: the reference computes one mask at the input length and hands
    it to every layer (IPDnet2.py:339); after time compression that length
    is stale for mhsa/ret layers, so here a fresh mask is built per
    distinct sequence length (identical whenever
    time_compression_ratio == 1, which is the only configuration the
    reference's non-Mamba paths can run).
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

    masks: dict[int, object] = {}
    new_time = []
    for i in range(cfg.num_layers):
        p = params["layers"][str(i)]
        st = state.time[i] if state is not None else (None, None)
        x = x + _fconv(p["fconv1"], x, cfg)
        if i == 0:
            x = _pool_freq(x, 2)
        x = x + _full(p, x, cfg)
        x = x + _fconv(p["fconv2"], x, cfg)
        if i == 0:
            x = _pool_freq(x, cfg.fre_compression_ratio // 2)
        t_now = x.shape[2]
        if state is None and t_now not in masks:
            masks[t_now] = get_causal_mask(cfg, t_now)
        d1, s1 = _time_block_1(p, x, cfg, masks.get(t_now), st[0])
        x = x + d1
        d2, s2 = _time_block_2(p, x, cfg, st[1])
        x = x + d2
        new_time.append((s1, s2))
        if i == cfg.time_compression_layer and cfg.time_compression_ratio > 1:
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
        return out, SpatialNetState(enc_tail, tuple(new_time))
    return out
