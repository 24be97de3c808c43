"""Spherical/Cartesian coordinate transforms (parity: FN-SSL/utils.py:56-81).

Convention: sph = (elevation theta in [0, pi] from +z, azimuth phi, radius).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cart2sph(cart: jax.Array, include_r: bool = False) -> jax.Array:
    r = jnp.sqrt(jnp.sum(cart ** 2, axis=-1))
    theta = jnp.arccos(cart[..., 2] / r)
    phi = jnp.arctan2(cart[..., 1], cart[..., 0])
    if include_r:
        return jnp.stack((theta, phi, r), axis=-1)
    return jnp.stack((theta, phi), axis=-1)


def cart2sph_np(cart):
    """Host-numpy variant in the reference Dataset convention
    (FN-SSL/Dataset.py:44-50): columns (r, elevation-from-+z, azimuth)."""
    import numpy as np

    xy2 = cart[..., 0] ** 2 + cart[..., 1] ** 2
    return np.stack([
        np.sqrt(xy2 + cart[..., 2] ** 2),
        np.arctan2(np.sqrt(xy2), cart[..., 2]),
        np.arctan2(cart[..., 1], cart[..., 0])], axis=-1)


def sph2cart(sph: jax.Array) -> jax.Array:
    if sph.shape[-1] == 2:
        sph = jnp.concatenate(
            [sph, jnp.ones_like(sph[..., :1])], axis=-1)
    x = sph[..., 2] * jnp.sin(sph[..., 0]) * jnp.cos(sph[..., 1])
    y = sph[..., 2] * jnp.sin(sph[..., 0]) * jnp.sin(sph[..., 1])
    z = sph[..., 2] * jnp.cos(sph[..., 0])
    return jnp.stack((x, y, z), axis=-1)
