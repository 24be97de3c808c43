"""Complex helpers on (..., 2) real/imag stacks.

Parity targets: FN-SSL/Module.py:12-23. Kept as pure jnp so XLA fuses them
into neighbouring ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def complex_multiplication(x: jax.Array, y: jax.Array) -> jax.Array:
    """(x0 + i x1)(y0 + i y1) on (..., 2) stacks."""
    return jnp.stack(
        [x[..., 0] * y[..., 0] - x[..., 1] * y[..., 1],
         x[..., 0] * y[..., 1] + x[..., 1] * y[..., 0]], axis=-1)


def complex_conjugate_multiplication(x: jax.Array, y: jax.Array) -> jax.Array:
    """x * conj(y) on (..., 2) stacks.

    NB: the reference names this "conjugate multiplication" but its formula
    (FN-SSL/Module.py:16-17) conjugates the *second* operand; we preserve
    that behaviour bit-for-bit.
    """
    return jnp.stack(
        [x[..., 0] * y[..., 0] + x[..., 1] * y[..., 1],
         x[..., 1] * y[..., 0] - x[..., 0] * y[..., 1]], axis=-1)


def complex_cart2polar(x: jax.Array) -> jax.Array:
    """(re, im) → (magnitude, phase) on (..., 2) stacks."""
    mod = jnp.sqrt(complex_conjugate_multiplication(x, x)[..., 0])
    phase = jnp.arctan2(x[..., 1], x[..., 0])
    return jnp.stack((mod, phase), axis=-1)
