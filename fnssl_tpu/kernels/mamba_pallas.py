"""Fused Pallas selective-scan (Mamba S6 recurrence) kernel.

The diagonal SSM recurrence h_t = Ā_t·h_{t-1} + ΔB_t·x_t with output
y_t = Σ_n h_t[·,n]·C_t[n] is HBM-bound under XLA's scan (each step
round-trips the (B, d, n) state and re-reads inputs with while-loop
overhead). This kernel keeps h resident in VMEM for the whole sequence,
double-buffers the per-step inputs from HBM, and fuses the C-contraction
into the step — one pass over the data (SURVEY.md §7.2 item 8).

Inputs are the precomputed per-step tensors (the projections around them
are large XLA matmuls):
  da  (T, B, d, n)   exp(Δ·A)
  dbx (T, B, d, n)   Δ·B·x
  c   (T, B, n)      output projection per step
Outputs: y (T, B, d) and the final state h_T (B, d, n).

Like the LSTM kernel, gradients recompute through the lax.scan reference
(custom_vjp in models/mamba.py wires this in).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS = True
except ImportError:  # pragma: no cover
    _PALLAS = False


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _selective_scan_kernel(da_hbm, dbx_hbm, c_hbm, h0_ref,
                           y_hbm, hT_ref,
                           h_scr, da_buf, dbx_buf, c_buf, y_buf,
                           in_sems, out_sems, *, t_steps: int):
    h_scr[:] = h0_ref[:]
    tb = h_scr.shape[0]
    prog = pl.program_id(0)

    def dma_in(slot, t):
        return (
            pltpu.make_async_copy(
                da_hbm.at[t, pl.ds(prog * tb, tb)], da_buf.at[slot],
                in_sems.at[slot, 0]),
            pltpu.make_async_copy(
                dbx_hbm.at[t, pl.ds(prog * tb, tb)], dbx_buf.at[slot],
                in_sems.at[slot, 1]),
            pltpu.make_async_copy(
                c_hbm.at[t, pl.ds(prog * tb, tb)], c_buf.at[slot],
                in_sems.at[slot, 2]),
        )

    def dma_out(slot, t):
        return pltpu.make_async_copy(
            y_buf.at[slot], y_hbm.at[t, pl.ds(prog * tb, tb)],
            out_sems.at[slot])

    for d in dma_in(0, 0):
        d.start()

    def body(t, _):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < t_steps)
        def _():
            for d in dma_in(nxt, t + 1):
                d.start()

        for d in dma_in(slot, t):
            d.wait()
        h = (da_buf[slot].astype(jnp.float32) * h_scr[:]
             + dbx_buf[slot].astype(jnp.float32))
        h_scr[:] = h
        # y[b, d] = Σ_n h[b, d, n] · c[b, n]
        y = jnp.sum(h * c_buf[slot].astype(jnp.float32)[:, None, :],
                    axis=-1)

        @pl.when(t >= 2)
        def _():
            dma_out(slot, t - 2).wait()

        y_buf[slot] = y.astype(y_buf.dtype)
        dma_out(slot, t).start()
        return ()

    jax.lax.fori_loop(0, t_steps, body, (), unroll=False)
    if t_steps >= 2:
        dma_out((t_steps - 2) % 2, t_steps - 2).wait()
    dma_out((t_steps - 1) % 2, t_steps - 1).wait()
    hT_ref[:] = h_scr[:]


def selective_scan_pallas(da, dbx, c, h0, *, block_b: int = 128,
                          interpret: bool = False):
    """da/dbx: (T, B, d, n); c: (T, B, n); h0: (B, d, n) f32.
    Returns y (T, B, d) f32, hT (B, d, n) f32."""
    t_steps, b, d, n = da.shape
    bp = _round_up(b, block_b)
    if bp != b:
        pad = bp - b
        da = jnp.pad(da, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dbx = jnp.pad(dbx, ((0, 0), (0, pad), (0, 0), (0, 0)))
        c = jnp.pad(c, ((0, 0), (0, pad), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0), (0, 0)))
    grid = (bp // block_b,)
    kernel = functools.partial(_selective_scan_kernel, t_steps=t_steps)
    y, h_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((block_b, d, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((block_b, d, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_steps, bp, d), jnp.float32),
            jax.ShapeDtypeStruct((bp, d, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, d, n), jnp.float32),      # h
            pltpu.VMEM((2, block_b, d, n), da.dtype),      # da dbuf
            pltpu.VMEM((2, block_b, d, n), dbx.dtype),     # dbx dbuf
            pltpu.VMEM((2, block_b, n), c.dtype),          # c dbuf
            pltpu.VMEM((2, block_b, d), jnp.float32),      # y dbuf
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(da, dbx, c, h0)
    return y[:, :b], h_t[:b]
