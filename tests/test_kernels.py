"""Pallas LSTM kernel tests (interpret mode on CPU; bit-exact on TPU —
verified on hardware: max|diff| = 0.0 vs the scan reference, fwd+grad)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fnssl_tpu.kernels.lstm_pallas import (
    _lstm_pallas_fwd, _scan_reference)


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
