"""Pallas selective-scan kernel vs the lax.scan reference (interpret
mode on CPU; bit-level check on TPU happens in the perf harness)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fnssl_tpu.kernels.mamba_pallas import selective_scan_pallas
from fnssl_tpu.models.mamba import _ssm_scan_ref


@pytest.mark.parametrize("t_steps", [1, 2, 9])
def test_selective_scan_interpret_matches_ref(rng, t_steps):
    b, d, n = 12, 8, 4
    da = jnp.asarray(rng.uniform(0.2, 0.99,
                                 (t_steps, b, d, n)).astype(np.float32))
    dbx = jnp.asarray(rng.standard_normal(
        (t_steps, b, d, n)).astype(np.float32) * 0.1)
    c = jnp.asarray(rng.standard_normal((t_steps, b, n)
                                        ).astype(np.float32))
    h0 = jnp.asarray(rng.standard_normal((b, d, n)).astype(np.float32))
    y_ref, h_ref = _ssm_scan_ref(da, dbx, c, h0)
    y, h_t = selective_scan_pallas(da, dbx, c, h0, block_b=8,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_t), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-6)


def test_ssm_scan_gradients_match(rng):
    """custom_vjp wrapper: gradients equal the pure-scan gradients."""
    from fnssl_tpu.models.mamba import ssm_scan

    t, b, d, n = 6, 4, 5, 3
    da = jnp.asarray(rng.uniform(0.5, 0.95, (t, b, d, n)
                                 ).astype(np.float32))
    dbx = jnp.asarray(rng.standard_normal((t, b, d, n)
                                          ).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((t, b, n)).astype(np.float32))
    h0 = jnp.zeros((b, d, n))

    def loss_w(fn):
        return lambda dbx_: jnp.sum(fn(da, dbx_, c, h0)[0] ** 2)

    g1 = jax.grad(loss_w(ssm_scan))(dbx)
    g2 = jax.grad(loss_w(_ssm_scan_ref))(dbx)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)
