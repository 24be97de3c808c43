"""Fused Pallas LSTM recurrence — the framework's hottest kernel.

The FN blocks run thousands of independent short sequences through small
LSTMs (SURVEY.md §7.3); XLA's ``lax.scan`` pays per-step while-loop and
buffer-management overhead on every one of the T≈298 iterations. This
kernel keeps (h, c) and the recurrent weights resident in VMEM for the
whole sequence and double-buffers the precomputed input gates from HBM,
so each step is just one MXU matmul + VPU gate math.

Split of work: the input projection x@W_ih.T + b is a single large matmul
left to XLA (it tiles perfectly); the kernel consumes the resulting
``xg (T, B, 4H)`` and runs only the recurrence. Gate order i, f, g, o
(torch). The backward pass recomputes via the lax.scan reference path
(jax.custom_vjp), so training keeps exact gradients while inference and
the forward half of training take the fused path.

Grid: programs over B tiles; each program owns its (TB, H) state for all
T steps (sequential dependency stays on-chip).
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


def pallas_available() -> bool:
    """Pallas dispatch gate. Set FNSSL_TPU_DISABLE_PALLAS=1 to force the
    lax.scan paths (e.g. when a remote compile service cannot build
    Mosaic kernels); numerics are identical either way."""
    import os

    if os.environ.get("FNSSL_TPU_DISABLE_PALLAS"):
        return False
    return _PALLAS and jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _lstm_kernel(xg_hbm, whh_ref, h0_ref, c0_ref, out_hbm, hT_ref, cT_ref,
                 h_scr, c_scr, xg_buf, out_buf, in_sems, out_sems,
                 *, t_steps: int, reverse: bool):
    h_scr[:] = h0_ref[:]
    c_scr[:] = c0_ref[:]
    tb = h_scr.shape[0]
    prog = pl.program_id(0)

    def t_index(t):
        return (t_steps - 1 - t) if reverse else t

    def in_dma(slot, t):
        return pltpu.make_async_copy(
            xg_hbm.at[t_index(t), pl.ds(prog * tb, tb), :],
            xg_buf.at[slot], in_sems.at[slot])

    def out_dma(slot, t):
        return pltpu.make_async_copy(
            out_buf.at[slot],
            out_hbm.at[t_index(t), pl.ds(prog * tb, tb), :],
            out_sems.at[slot])

    in_dma(0, 0).start()

    def body(t, _):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < t_steps)
        def _():
            in_dma(nxt, t + 1).start()

        in_dma(slot, t).wait()
        gates = (xg_buf[slot].astype(jnp.float32)
                 + jnp.dot(h_scr[:], whh_ref[:],
                           preferred_element_type=jnp.float32))
        hidden = gates.shape[-1] // 4
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c = f * c_scr[:] + i * g
        h = o * jnp.tanh(c)
        c_scr[:] = c
        h_scr[:] = h

        # wait for the previous write of this slot before reusing it
        @pl.when(t >= 2)
        def _():
            out_dma(slot, t - 2).wait()

        out_buf[slot] = h.astype(out_buf.dtype)
        out_dma(slot, t).start()
        return ()

    jax.lax.fori_loop(0, t_steps, body, (), unroll=False)
    if t_steps >= 2:
        out_dma((t_steps - 2) % 2, t_steps - 2).wait()
    out_dma((t_steps - 1) % 2, t_steps - 1).wait()
    hT_ref[:] = h_scr[:]
    cT_ref[:] = c_scr[:]


_VMEM_BUDGET = 12 * 1024 * 1024  # headroom under the ~16 MB/core VMEM


def _vmem_bytes(block_b: int, hidden: int, itemsize: int) -> int:
    """Estimate of the kernel's per-program VMEM footprint: the resident
    w_hh tile, the f32 state refs/scratch (block-mapped refs counted
    twice for Mosaic's pipeline double-buffering), and the xg/out DMA
    double buffers."""
    four_h = 4 * hidden
    per_b = (4 * hidden * 4 * 2      # h0/c0/hT/cT f32, ×2 pipeline bufs
             + 2 * hidden * 4        # h/c scratch f32
             + 2 * four_h * itemsize  # xg double buffer
             + 2 * hidden * itemsize)  # out double buffer
    return hidden * four_h * itemsize + block_b * per_b


def _auto_block_b(hidden: int, itemsize: int = 2) -> int | None:
    """Largest batch tile fitting the VMEM budget (empirical start:
    block·H ≤ 128k elements; bigger tiles mean bigger per-step MXU
    matmuls). Shrinks for hidden sizes outside the tested range; returns
    None when even the minimum tile cannot fit (e.g. w_hh alone exceeds
    VMEM) so the caller falls back to the scan path instead of failing
    at Mosaic compile time."""
    block = max(128, min(1024, (131072 // hidden) // 128 * 128))
    while block > 8 and _vmem_bytes(block, hidden, itemsize) > _VMEM_BUDGET:
        block //= 2
    if _vmem_bytes(block, hidden, itemsize) > _VMEM_BUDGET:
        return None
    return block


def _lstm_pallas_fwd(xg, w_hh_t, h0, c0, *, reverse: bool,
                     block_b: int | None = None, interpret: bool = False):
    """xg: (T, B, 4H) bf16/f32; w_hh_t: (H, 4H); h0/c0: (B, H) f32.
    Returns ys (T, B, H) in xg.dtype, hT, cT (B, H) f32."""
    t_steps, b, four_h = xg.shape
    hidden = four_h // 4
    if block_b is None:
        block_b = _auto_block_b(hidden, xg.dtype.itemsize)
    if block_b is None:
        raise ValueError(
            f"hidden={hidden} exceeds the VMEM budget at any batch tile; "
            "use the lax.scan path")
    bp = _round_up(b, block_b)
    if bp != b:
        xg = jnp.pad(xg, ((0, 0), (0, bp - b), (0, 0)))
        h0 = jnp.pad(h0, ((0, bp - b), (0, 0)))
        c0 = jnp.pad(c0, ((0, bp - b), (0, 0)))
    grid = (bp // block_b,)

    kernel = functools.partial(_lstm_kernel, t_steps=t_steps,
                               reverse=reverse)
    ys, h_t, c_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # xg stays in HBM
            pl.BlockSpec((hidden, four_h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # ys written by DMA
            pl.BlockSpec((block_b, hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_steps, bp, hidden), xg.dtype),
            jax.ShapeDtypeStruct((bp, hidden), jnp.float32),
            jax.ShapeDtypeStruct((bp, hidden), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, hidden), jnp.float32),   # h
            pltpu.VMEM((block_b, hidden), jnp.float32),   # c
            pltpu.VMEM((2, block_b, four_h), xg.dtype),   # xg double buf
            pltpu.VMEM((2, block_b, hidden), xg.dtype),   # out double buf
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # batch tiles are independent → Mosaic may split the grid
        # across the chip's TensorCores (megacore)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(xg, w_hh_t, h0, c0)
    return ys[:, :b], h_t[:b], c_t[:b]


def _scan_reference(x, w_ih, w_hh, bias, h0, c0, reverse: bool):
    """lax.scan LSTM used for gradients and as numerical reference."""
    xg = x @ w_ih.T + bias
    xg = jnp.swapaxes(xg, 0, 1)
    w_hh_t = w_hh.T
    # f32 recurrence regardless of the input dtype (matches the Pallas
    # kernel's accumulation; also keeps the scan carry type stable when
    # h0/c0 arrive in bf16)
    carry0 = (h0.astype(jnp.float32), c0.astype(jnp.float32))

    def step(carry, xg_t):
        h, c = carry
        gates = xg_t.astype(jnp.float32) + h @ w_hh_t.astype(jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h.astype(x.dtype)

    (h_t, c_t), ys = jax.lax.scan(step, carry0, xg, reverse=reverse)
    return (jnp.swapaxes(ys, 0, 1), h_t.astype(h0.dtype),
            c_t.astype(c0.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def lstm_fused_scan(x, w_ih, w_hh, bias, h0, c0, reverse: bool = False):
    """Fused-forward LSTM direction. x: (B, T, I) → ys (B, T, H), hT, cT.

    Forward runs the Pallas kernel on TPU (scan elsewhere). Backward is a
    memory-lean hand-written scan (``_lstm_backward``): it recomputes the
    gates per step from (x, ys) and accumulates the weight gradients in
    the scan carry, so nothing of size (T, B, 4H) is ever stored — the
    residuals are just x and ys. Differentiating the scan the naive way
    stores ~6 (T, B, H) gate tensors per LSTM, which at the reference
    training scale (bz 16 × 4.79 s, 6 LSTM passes) wants ~38 GB HBM and
    cannot fit one chip; this formulation trades ~1.5× backward FLOPs
    (all MXU-shaped matmuls) for that memory.
    """
    hidden = w_hh.shape[-1]
    # hidden must align to the 128-lane Mosaic tiling: the kernel's
    # (2, block_b, hidden) double-buffer slot slices fail to compile
    # otherwise ("Slice shape along dimension 2 must be aligned to
    # tiling (128), but is 64" — IPDnet's 64-hidden full-band LSTM)
    if (not pallas_available() or hidden % 128 != 0
            or _auto_block_b(hidden, x.dtype.itemsize) is None):
        return _scan_reference(x, w_ih, w_hh, bias, h0, c0, reverse)
    xg = x @ w_ih.T + bias                      # (B, T, 4H) big MXU matmul
    xg = jnp.swapaxes(xg, 0, 1)                 # (T, B, 4H)
    ys, h_t, c_t = _lstm_pallas_fwd(
        xg, w_hh.T.astype(xg.dtype),
        h0.astype(jnp.float32), c0.astype(jnp.float32), reverse=reverse)
    # carry dtypes must match _scan_reference exactly (h0/c0, not x):
    # the custom_vjp backward differentiates the scan path, and mixed
    # h0-vs-x dtypes (e.g. f32 streaming state under the bf16 policy)
    # would otherwise disagree on the cotangent dtype.
    return (jnp.swapaxes(ys, 0, 1), h_t.astype(h0.dtype),
            c_t.astype(c0.dtype))


def _fwd(x, w_ih, w_hh, bias, h0, c0, reverse):
    out = lstm_fused_scan(x, w_ih, w_hh, bias, h0, c0, reverse)
    return out, (x, w_ih, w_hh, bias, h0, c0, out[0])


def _lstm_backward(reverse, residuals, grads):
    """Recompute-in-backward LSTM gradient.

    Stage 1 replays the cell state c_t with a forward scan (h comes for
    free from the stored ys, so there is no h recurrence to replay);
    stage 2 runs the reverse scan, recomputing the four gates per step
    and accumulating dW_ih/dW_hh/db in the carry while emitting dx_t.
    All recurrence math is f32, exactly like the forward. Under bf16
    compute the replay reads h through the bf16 ys (one rounding of h
    the naive differentiate-the-scan backward wouldn't have) — the same
    order of error AMP training already accepts; the fp32 path is exact.
    """
    x, w_ih, w_hh, bias, h0, c0, ys = residuals
    dys, dh_t, dc_t = grads
    f32 = jnp.float32

    def tmajor(a):
        a = jnp.swapaxes(a, 0, 1)
        return jnp.flip(a, 0) if reverse else a

    x_t, ys_t, dys_t = tmajor(x), tmajor(ys), tmajor(dys)
    h_prev = jnp.concatenate(
        [h0[None].astype(ys_t.dtype), ys_t[:-1]], axis=0)
    w_hh_f = w_hh.astype(f32)

    def gates_f32(xi, hp):
        # identical quantization to the forward: the input projection in
        # the original dtypes (a per-step slice of the forward's whole-
        # matrix x @ w_ih.T + bias), recurrence f32
        return (xi @ w_ih.T + bias).astype(f32) + hp.astype(f32) @ w_hh_f.T

    def replay(c, inp):
        xi, hp = inp
        i, f, g, _ = jnp.split(gates_f32(xi, hp), 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        return c, c

    _, c_seq = jax.lax.scan(replay, c0.astype(f32), (x_t, h_prev))
    c_prev = jnp.concatenate([c0[None].astype(f32), c_seq[:-1]], axis=0)

    def bwd_step(carry, inp):
        dh, dc, d_wih, d_whh, db = carry
        xi, hp, cp, ct, dy = inp
        i, f, g, o = jnp.split(gates_f32(xi, hp), 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        tc = jnp.tanh(ct)
        dh_total = dy.astype(f32) + dh
        dct = dc + dh_total * o * (1.0 - tc * tc)
        dgates = jnp.concatenate([
            dct * g * i * (1.0 - i),
            dct * cp * f * (1.0 - f),
            dct * i * (1.0 - g * g),
            dh_total * tc * o * (1.0 - o),
        ], axis=-1)                                   # (B, 4H) f32
        dx_i = (dgates @ w_ih.astype(f32)).astype(x.dtype)   # (B, I)
        carry = (dgates @ w_hh_f,                     # dh_{t-1}
                 dct * f,                             # dc_{t-1}
                 d_wih + dgates.T @ xi.astype(f32),
                 d_whh + dgates.T @ hp.astype(f32),
                 db + dgates.sum(axis=0))
        return carry, dx_i

    four_h, in_sz = w_ih.shape
    hid = w_hh.shape[1]
    init = (dh_t.astype(f32), dc_t.astype(f32),
            jnp.zeros((four_h, in_sz), f32), jnp.zeros((four_h, hid), f32),
            jnp.zeros((four_h,), f32))
    (dh0, dc0, d_wih, d_whh, db), dx_t = jax.lax.scan(
        bwd_step, init, (x_t, h_prev, c_prev, c_seq, dys_t), reverse=True)
    dx = jnp.flip(dx_t, 0) if reverse else dx_t
    return (jnp.swapaxes(dx, 0, 1).astype(x.dtype),
            d_wih.astype(w_ih.dtype), d_whh.astype(w_hh.dtype),
            db.astype(bias.dtype), dh0.astype(h0.dtype),
            dc0.astype(c0.dtype))


lstm_fused_scan.defvjp(_fwd, _lstm_backward)
