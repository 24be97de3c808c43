"""GCC-PHAT and SRP-PHAT map (parity: FN-SSL/Module.py:649-742).

Both are classical DSP baselines used by the reference's `wDNN=False` path.
The cross-spectrum over all N×N signal pairs is computed as one broadcasted
complex product (no per-signal python loop), and the SRP map lookup is a
single static gather — both MXU/VPU friendly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("tau_max", "phat"))
def gcc(x: jax.Array, *, tau_max: int | None = None,
        phat: bool = False) -> jax.Array:
    """Generalized cross-correlation of N signals.

    Args:
      x: (..., N, K) time-domain frames.
    Returns:
      (..., N, N, 2*tau_max+1) GCC, lags ordered [0..tau_max, -tau_max..-1]
      as in the reference.
    """
    k = x.shape[-1]
    tmax = k // 2 if tau_max is None else tau_max
    xf = jnp.fft.rfft(x, axis=-1)
    if phat:
        xf = xf / (jnp.abs(xf) + 1e-12)
    # Cross spectrum X_n * conj(X_m) for all pairs (n, m) — the reference's
    # convention (its "conjugate multiplication" conjugates operand 2).
    cross = xf[..., :, None, :] * jnp.conj(xf[..., None, :, :])
    g = jnp.fft.irfft(cross, n=k, axis=-1)
    head = g[..., : tmax + 1]
    tail = g[..., -tmax:]
    return jnp.concatenate([head, tail], axis=-1).astype(jnp.float32)


class SRPMap:
    """Steered-response-power map from GCCs over a (theta, phi) grid.

    Precomputes the per-direction lag lookup table on host (numpy) once; the
    forward is a gather + reduction under jit.
    """

    def __init__(self, n: int, k: int, res_theta: int, res_phi: int,
                 rn: np.ndarray, fs: float, c: float = 343.0,
                 normalize: bool = True, theta_max: float = np.pi / 2):
        self.n, self.k = n, k
        self.res_theta, self.res_phi = res_theta, res_phi
        self.normalize = normalize

        theta = np.linspace(0, theta_max, res_theta)
        phi = np.linspace(-np.pi, np.pi, res_phi + 1)[:-1]
        r = np.stack([np.outer(np.sin(theta), np.cos(phi)),
                      np.outer(np.sin(theta), np.sin(phi)),
                      np.tile(np.cos(theta), [res_phi, 1]).T], axis=2)
        # IMTDF[i,j,kk,l] = r . (rn[l]-rn[kk]) / c
        diff = rn[None, :, :] - rn[:, None, :]  # (N, N, 3)
        imtdf = np.einsum("ijd,kld->ijkl", r, diff) / c

        tau = np.concatenate(
            [np.arange(0, k // 2 + 1), np.arange(-k // 2 + 1, 0)]) / float(fs)
        tau0 = np.argmin(
            np.abs(imtdf[..., None] - tau[None, None, None, None, :]),
            axis=-1).astype(np.int64)
        tau0[tau0 > k // 2] -= k
        tau0 = tau0.transpose(2, 3, 0, 1)  # (N, N, resTheta, resPhi)
        tau0 = np.where(tau0 < 0, tau0 + (2 * (k // 2) + 1), tau0)
        self._tau0 = jnp.asarray(tau0)

    def __call__(self, gccs: jax.Array) -> jax.Array:
        """gccs: (..., N, N, L) → maps (..., resTheta, resPhi)."""
        maps = jnp.zeros(gccs.shape[:-3] + (self.res_theta, self.res_phi),
                         gccs.dtype)
        # static small loop over N*N pairs (N is tiny), fused by XLA
        for n in range(self.n):
            for m in range(self.n):
                maps = maps + gccs[..., n, m, :][..., self._tau0[n, m]]
        if self.normalize:
            mean = jnp.mean(maps, axis=(-2, -1), keepdims=True)
            maps = maps - mean + 1e-12
            maps = maps / jnp.max(maps, axis=(-2, -1), keepdims=True)
        return maps
