"""Training losses: IPD MSE, DOA cross-entropy, and frame-level PIT.

Parity targets:
  * FN-SSL MSE on pair-unbatched IPD (Lightning/main.py:191-198,
    Learner.py:470-487).
  * FN-SSL classification CE on azimuth classes (Learner.py:489-496).
  * IPDnet frame-level permutation-invariant MSE over 2 tracks
    (runIPDnetOn.py:196-206, torchmetrics PIT) — vectorized here over all
    ns! permutations (ns≤4) instead of the reference's torchmetrics path.
"""
from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp

from fnssl_tpu.core.pairs import pair_unbatch


@functools.partial(jax.jit, static_argnames=("nb",))
def mse_ipd_loss(pred: jax.Array, gt_ipd: jax.Array, nb: int) -> jax.Array:
    """FN-SSL regression loss.

    Args:
      pred: (nb*P, nt, 2nf) model output (pair dim folded into batch).
      gt_ipd: (nb, nt, 2nf, P) VAD-gated source-summed targets.
    """
    pred = pair_unbatch(pred, nb)               # (nb, P, nt, 2nf)
    pred = jnp.transpose(pred, (0, 2, 3, 1))    # (nb, nt, 2nf, P)
    return jnp.mean((pred - gt_ipd) ** 2)


@jax.jit
def ce_doa_loss(pred_logits: jax.Array, doa_class: jax.Array) -> jax.Array:
    """Azimuth-classification loss (Learner.py:489-496).

    Args:
      pred_logits: (nb, nt, 180); doa_class: (nb, nt) int class labels.
    """
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, doa_class[..., None], axis=-1)
    return jnp.mean(nll)


def _perm_table(ns: int) -> jnp.ndarray:
    return jnp.asarray(list(itertools.permutations(range(ns))))


@jax.jit
def pit_mse_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Frame-level permutation-invariant MSE over the track axis.

    For every frame independently, picks the track permutation minimizing
    the MSE (the reference's torchmetrics `permutation_invariant_training`
    with eval_func='min' at frame level, runIPDnetOn.py:196-206).

    Args:
      pred, gt: (nb, nt, F, P, ns) — F = 2·nf features, P mic pairs,
        ns tracks.
    Returns:
      scalar mean of per-frame best-permutation MSE.
    """
    ns = pred.shape[-1]
    perms = _perm_table(ns)                      # (n_perm, ns)
    # cost per (batch, frame, perm): mean over (F, P, ns)
    def perm_cost(perm):
        diff = pred[..., perm] - gt
        return jnp.mean(diff * diff, axis=(2, 3, 4))  # (nb, nt)

    costs = jax.vmap(perm_cost)(perms)           # (n_perm, nb, nt)
    return jnp.mean(jnp.min(costs, axis=0))


@jax.jit
def pit_permutation(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Best per-frame permutation indices (for pit_permutate-style decode).

    Returns (nb, nt) int index into itertools.permutations(range(ns)).
    """
    perms = _perm_table(pred.shape[-1])

    def perm_cost(perm):
        diff = pred[..., perm] - gt
        return jnp.mean(diff * diff, axis=(2, 3, 4))

    costs = jax.vmap(perm_cost)(perms)
    return jnp.argmin(costs, axis=0)
