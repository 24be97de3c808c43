"""Pallas LSTM kernel tests (interpret mode on CPU; bit-exact on TPU —
verified on hardware: max|diff| = 0.0 vs the scan reference, fwd+grad)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fnssl_tpu.kernels.lstm_pallas import (
    _VMEM_BUDGET, _auto_block_b, _lstm_pallas_fwd, _scan_reference,
    _vmem_bytes, lstm_fused_scan)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("t_steps", [1, 2, 7])
def test_pallas_kernel_interpret_matches_scan(rng, reverse, t_steps):
    b, i, h = 16, 8, 8
    x = jnp.asarray(rng.standard_normal((b, t_steps, i)).astype(np.float32))
    w_ih = jnp.asarray(
        (rng.standard_normal((4 * h, i)) * 0.2).astype(np.float32))
    w_hh = jnp.asarray(
        (rng.standard_normal((4 * h, h)) * 0.2).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(4 * h).astype(np.float32) * 0.1)
    h0 = jnp.zeros((b, h))
    c0 = jnp.zeros((b, h))

    ref_ys, ref_h, ref_c = _scan_reference(x, w_ih, w_hh, bias, h0, c0,
                                           reverse)
    xg = jnp.swapaxes(x @ w_ih.T + bias, 0, 1)
    ys, h_t, c_t = _lstm_pallas_fwd(xg, w_hh.T, h0, c0, reverse=reverse,
                                    block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(ys, 0, 1)),
                               np.asarray(ref_ys), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_t), np.asarray(ref_h),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_t), np.asarray(ref_c),
                               rtol=1e-5, atol=1e-6)


def test_pallas_kernel_pads_ragged_batch(rng):
    """B not a multiple of block_b → zero-padded tiles, correct crop."""
    b, t, i, h = 11, 5, 8, 8
    x = jnp.asarray(rng.standard_normal((b, t, i)).astype(np.float32))
    w_ih = jnp.asarray(
        (rng.standard_normal((4 * h, i)) * 0.2).astype(np.float32))
    w_hh = jnp.asarray(
        (rng.standard_normal((4 * h, h)) * 0.2).astype(np.float32))
    bias = jnp.zeros(4 * h)
    h0 = jnp.zeros((b, h))
    c0 = jnp.zeros((b, h))
    ref_ys, _, _ = _scan_reference(x, w_ih, w_hh, bias, h0, c0, False)
    xg = jnp.swapaxes(x @ w_ih.T + bias, 0, 1)
    ys, _, _ = _lstm_pallas_fwd(xg, w_hh.T, h0, c0, reverse=False,
                                block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(ys, 0, 1)),
                               np.asarray(ref_ys), rtol=1e-5, atol=1e-6)


def test_auto_block_b_respects_vmem_budget():
    """Every hidden size picks a tile under the budget; absurd hidden
    sizes (w_hh alone over VMEM) return None instead of letting Mosaic
    fail at compile time."""
    for hidden in (8, 64, 128, 256, 512, 1024, 2048, 4096):
        for itemsize in (2, 4):
            block = _auto_block_b(hidden, itemsize)
            if block is not None:
                assert _vmem_bytes(block, hidden, itemsize) <= _VMEM_BUDGET
    # tested-range sizes keep the original empirical tiles
    assert _auto_block_b(128, 2) == 1024
    assert _auto_block_b(256, 2) == 512
    # w_hh (H, 4H) f32 at H=8192 is 1 GiB: cannot fit at any tile
    assert _auto_block_b(8192, 4) is None


@pytest.mark.parametrize("reverse", [False, True])
def test_handwritten_backward_matches_autodiff(rng, reverse):
    """The memory-lean recompute backward must equal jax.grad of the
    scan reference (fp32: exact math, tiny accumulation-order noise)."""
    b, t, i, h = 6, 9, 5, 7
    args = (
        jnp.asarray(rng.standard_normal((b, t, i)), jnp.float32),
        jnp.asarray(rng.standard_normal((4 * h, i)) * 0.3, jnp.float32),
        jnp.asarray(rng.standard_normal((4 * h, h)) * 0.3, jnp.float32),
        jnp.asarray(rng.standard_normal(4 * h) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((b, h)) * 0.5, jnp.float32),
        jnp.asarray(rng.standard_normal((b, h)) * 0.5, jnp.float32),
    )
    # weighted sum of every output so all three cotangents are non-trivial
    wy = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
    wh = jnp.asarray(rng.standard_normal((b, h)), jnp.float32)

    def loss_fused(*a):
        ys, h_t, c_t = lstm_fused_scan(*a, reverse)
        return (ys * wy).sum() + (h_t * wh).sum() + (c_t * wh).sum()

    def loss_ref(*a):
        ys, h_t, c_t = _scan_reference(*a, reverse)
        return (ys * wy).sum() + (h_t * wh).sum() + (c_t * wh).sum()

    g_fused = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-5)


def test_grad_with_mixed_state_dtype(rng, monkeypatch):
    """bf16 compute policy + f32 streaming carries: the Pallas primal and
    the scan backward must agree on carry dtypes. Regression for the TPU
    bf16 train step failing with a cotangent dtype mismatch (hT was
    returned in x.dtype while the scan reference uses h0.dtype)."""
    import functools  # noqa: F401

    import fnssl_tpu.kernels.lstm_pallas as lp

    monkeypatch.setattr(lp, "pallas_available", lambda: True)
    orig = lp._lstm_pallas_fwd
    monkeypatch.setattr(
        lp, "_lstm_pallas_fwd",
        lambda xg, w, h0, c0, reverse: orig(xg, w, h0, c0, reverse=reverse,
                                            block_b=8, interpret=True))
    b, t, i, h = 8, 4, 8, 8
    x = jnp.asarray(rng.standard_normal((b, t, i)), jnp.bfloat16)
    w_ih = jnp.asarray(rng.standard_normal((4 * h, i)) * 0.2, jnp.bfloat16)
    w_hh = jnp.asarray(rng.standard_normal((4 * h, h)) * 0.2, jnp.bfloat16)
    bias = jnp.zeros(4 * h, jnp.bfloat16)
    h0 = c0 = jnp.zeros((b, h), jnp.float32)   # f32 carry, bf16 compute

    def loss(x, w_ih):
        ys, h_t, c_t = lp.lstm_fused_scan(x, w_ih, w_hh, bias, h0, c0,
                                          False)
        return (ys.astype(jnp.float32).sum()
                + h_t.astype(jnp.float32).sum())

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w_ih)  # must not raise
    assert gx.dtype == jnp.bfloat16 and np.isfinite(
        np.asarray(gx, np.float32)).all()


def test_oversized_hidden_falls_back_to_scan(rng, monkeypatch):
    """lstm_fused_scan must not attempt the Pallas kernel when no batch
    tile fits VMEM — it silently takes the scan path (same numerics)."""
    monkeypatch.setattr("fnssl_tpu.kernels.lstm_pallas.pallas_available",
                        lambda: True)
    b, t, i, h = 2, 3, 4, 8192
    x = jnp.asarray(rng.standard_normal((b, t, i)).astype(np.float32))
    w_ih = jnp.zeros((4 * h, i), jnp.float32)
    w_hh = jnp.zeros((4 * h, h), jnp.float32)
    bias = jnp.zeros(4 * h)
    h0 = c0 = jnp.zeros((b, h))
    ys, h_t, c_t = lstm_fused_scan(x, w_ih, w_hh, bias, h0, c0)
    ref_ys, ref_h, ref_c = _scan_reference(x, w_ih, w_hh, bias, h0, c0,
                                           False)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref_ys))
