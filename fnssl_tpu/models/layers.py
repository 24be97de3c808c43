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


def init_conv2d_params(key: jax.Array, in_ch: int, out_ch: int,
                       kernel: tuple[int, int], bias: bool = True,
                       dtype=jnp.float32) -> dict[str, jax.Array]:
    """torch nn.Conv2d default init; weight layout (out, in, kh, kw)."""
    fan_in = in_ch * kernel[0] * kernel[1]
    k = 1.0 / math.sqrt(fan_in)
    kw_, kb = jax.random.split(key)
    params = {"weight": jax.random.uniform(
        kw_, (out_ch, in_ch) + tuple(kernel), dtype, minval=-k, maxval=k)}
    if bias:
        params["bias"] = jax.random.uniform(kb, (out_ch,), dtype,
                                            minval=-k, maxval=k)
    return params


def conv2d(params: dict[str, jax.Array], x: jax.Array,
           padding=((0, 0), (0, 0))) -> jax.Array:
    """NCHW conv with torch weight layout and explicit (h, w) padding."""
    out = jax.lax.conv_general_dilated(
        x, params["weight"], window_strides=(1, 1), padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "bias" in params:
        out = out + params["bias"][None, :, None, None]
    return out


def prelu(params: dict[str, jax.Array], x: jax.Array) -> jax.Array:
    """torch nn.PReLU with a single shared slope parameter 'weight'."""
    a = params["weight"]
    return jnp.where(x >= 0, x, a * x)


def init_prelu_params(init: float = 0.25, dtype=jnp.float32):
    return {"weight": jnp.asarray([init], dtype)}


def avg_pool_time(x: jax.Array, k: int) -> jax.Array:
    """(B, T, C) → (B, T//k, C), mean over non-overlapping windows of k.

    Equivalent to the reference's AvgPool2d((k, 1)) applied to an unbatched
    (C=B, H=T, W=C) view (FN-SSL/Model.py:68,80).
    """
    b, t, c = x.shape
    t2 = t // k
    return x[:, : t2 * k].reshape(b, t2, k, c).mean(axis=2)
