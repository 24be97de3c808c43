"""Spherical padding and causal convolution blocks.

Parity: FN-SSL/Module.py:745-865 — SphericPad (replicate time, reflect
elevation, circular azimuth), CausConv1d/2d/3d (left-causal time padding
with right crop), CausCnnBlock (residual conv block with causal width
padding). These are the reference's SRP-map CNN utilities; functional
JAX equivalents with torch parameter shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from fnssl_tpu.models.layers import conv2d, init_conv2d_params  # noqa: F401


def spheric_pad(x: jax.Array, pad) -> jax.Array:
    """pad = (left, right, top, bottom[, front, back]) for the
    (azimuth, elevation[, time]) trailing axes.

    Circular on azimuth (last axis), reflect on elevation (second-last),
    replicate on time (third-last, optional).
    """
    if len(pad) == 4:
        left, right, top, bottom = pad
        front = back = 0
    elif len(pad) == 6:
        left, right, top, bottom, front, back = pad
    else:
        raise ValueError("pad must have 4 or 6 entries")
    assert x.shape[-1] >= right and x.shape[-1] >= left
    if front > 0 or back > 0:
        cfg = [(0, 0)] * x.ndim
        cfg[-3] = (front, back)
        x = jnp.pad(x, cfg, mode="edge")
    if top > 0 or bottom > 0:
        cfg = [(0, 0)] * x.ndim
        cfg[-2] = (top, bottom)
        x = jnp.pad(x, cfg, mode="reflect")
    if left > 0 or right > 0:
        x = jnp.concatenate([x[..., -left:], x, x[..., :right]], axis=-1)
    return x


def caus_conv1d(params, x: jax.Array, dilation: int = 1) -> jax.Array:
    """Causal conv over the last axis. x: (B, C, T); weight (O, I, K)."""
    k = params["weight"].shape[-1]
    pad = (k - 1) * dilation
    out = jax.lax.conv_general_dilated(
        x, params["weight"], window_strides=(1,), padding=[(pad, 0)],
        rhs_dilation=(dilation,), dimension_numbers=("NCH", "OIH", "NCH"))
    return out + params["bias"][None, :, None]


def caus_conv2d(params, x: jax.Array) -> jax.Array:
    """Causal in time (axis 2), valid in the last axis.
    x: (B, C, T, F); weight (O, I, Kt, Kf)."""
    kt = params["weight"].shape[2]
    out = jax.lax.conv_general_dilated(
        x, params["weight"], window_strides=(1, 1),
        padding=[(kt - 1, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + params["bias"][None, :, None, None]


def caus_conv3d(params, x: jax.Array) -> jax.Array:
    """Causal in time (axis 2) for SRP-map sequences.
    x: (B, C, T, E, A); weight (O, I, Kt, Ke, Ka)."""
    kt = params["weight"].shape[2]
    out = jax.lax.conv_general_dilated(
        x, params["weight"], window_strides=(1, 1, 1),
        padding=[(kt - 1, 0), (0, 0), (0, 0)],
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    return out + params["bias"][None, :, None, None, None]


def batch_norm_2d(p, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """On-the-fly batch statistics over (B, H, W) per channel."""
    mean = jnp.mean(x, axis=(0, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(0, 2, 3), keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    return out * p["weight"].reshape(1, -1, 1, 1) \
        + p["bias"].reshape(1, -1, 1, 1)


def caus_cnn_block(params, x: jax.Array, padding=(1, 2),
                   use_res: bool = True) -> jax.Array:
    """Residual causal conv block (Module.py:827-865). x: (B, C, H, W);
    params: conv1/bn1/conv2/bn2 (+ optional downsample conv)."""
    residual = x
    out = conv2d(params["conv1"], x,
                 padding=((padding[0], padding[0]),
                          (padding[1], padding[1])))
    out = jax.nn.relu(batch_norm_2d(params["bn1"], out))
    if padding[1]:
        out = out[..., : -padding[1]]
    out = conv2d(params["conv2"], out,
                 padding=((padding[0], padding[0]),
                          (padding[1], padding[1])))
    out = batch_norm_2d(params["bn2"], out)
    if padding[1]:
        out = out[..., : -padding[1]]
    if use_res:
        if "downsample" in params:
            residual = conv2d(params["downsample"], x)
        out = out + residual
    return jax.nn.relu(out)
