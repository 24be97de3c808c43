"""Small functional layers with torch-compatible parameter naming."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def init_linear_params(key: jax.Array, in_features: int, out_features: int,
                       dtype=jnp.float32) -> dict[str, jax.Array]:
    """torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))."""
    k = 1.0 / math.sqrt(in_features)
    kw, kb = jax.random.split(key)
    return {
        "weight": jax.random.uniform(kw, (out_features, in_features), dtype,
                                     minval=-k, maxval=k),
        "bias": jax.random.uniform(kb, (out_features,), dtype,
                                   minval=-k, maxval=k),
    }


def linear(params: dict[str, jax.Array], x: jax.Array) -> jax.Array:
    return x @ params["weight"].T + params["bias"]


def dropout(x: jax.Array, rate: float, rng: jax.Array | None,
            training: bool) -> jax.Array:
    """Inverted dropout (torch semantics). Identity when not training."""
    if not training or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def avg_pool_time(x: jax.Array, k: int) -> jax.Array:
    """(B, T, C) → (B, T//k, C), mean over non-overlapping windows of k.

    Equivalent to the reference's AvgPool2d((k, 1)) applied to an unbatched
    (C=B, H=T, W=C) view (FN-SSL/Model.py:68,80).
    """
    b, t, c = x.shape
    t2 = t // k
    return x[:, : t2 * k].reshape(b, t2, k, c).mean(axis=2)
