"""Normalization zoo + grouped linears + non-linear factory.

Functional equivalents of IPDnet2/arch/base/{norm,linear_group,
non_linear}.py with the reference's parameter shapes and semantics:
  * layer_norm / global_layer_norm (gLN) / batch_norm_1d (stats-free
    inference form) / group_norm / group_batch_norm (NBC2 narrow-band
    group statistics) + the ``new_norm`` factory;
  * linear_group (per-group weights via einsum), linear_group_shared,
    conv1d_group;
  * prelu with a ``dim`` argument + ``new_non_linear`` factory.
"""
from __future__ import annotations

import math
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- norms


def init_affine(dim: int, seq_last: bool = False):
    shape = (dim, 1) if seq_last else (dim,)
    return {"weight": jnp.ones(shape), "bias": jnp.zeros(shape)}


def layer_norm(p, x, seq_last: bool = False, eps: float = 1e-5):
    """LN over the hidden dim; seq_last puts hidden at axis 1
    (norm.py:11-27)."""
    if seq_last:
        x = jnp.swapaxes(x, -1, 1)
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    w = p["weight"].reshape(-1)
    b = p["bias"].reshape(-1)
    out = (x - mean) * jax.lax.rsqrt(var + eps) * w + b
    return jnp.swapaxes(out, -1, 1) if seq_last else out


def global_layer_norm(p, x, seq_last: bool = False, eps: float = 1e-5):
    """gLN: stats over (Seq, H) jointly (norm.py:30-60)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def batch_norm_1d(p, x, seq_last: bool = True, eps: float = 1e-5):
    """Batch norm computing batch statistics on the fly (train-mode
    semantics; the reference never runs eval-mode BN in its configs)."""
    if not seq_last:
        x = jnp.swapaxes(x, -1, -2)      # (B, H, Seq)
    mean = jnp.mean(x, axis=(0, 2), keepdims=True)
    var = jnp.var(x, axis=(0, 2), keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    out = out * p["weight"].reshape(1, -1, 1) + p["bias"].reshape(1, -1, 1)
    return jnp.swapaxes(out, -1, -2) if not seq_last else out


def group_norm(p, x, num_groups: int, seq_last: bool = True,
               eps: float = 1e-5):
    """torch GroupNorm semantics on (B, H, ...) (norm.py:80-91)."""
    if not seq_last:
        x = jnp.swapaxes(x, -1, 1)
    b, h = x.shape[:2]
    rest = x.shape[2:]
    g = x.reshape((b, num_groups, h // num_groups) + rest)
    axes = tuple(range(2, g.ndim))
    mean = jnp.mean(g, axes, keepdims=True)
    var = jnp.var(g, axes, keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    out = g.reshape((b, h) + rest)
    shape = (1, h) + (1,) * len(rest)
    out = out * p["weight"].reshape(shape) + p["bias"].reshape(shape)
    return jnp.swapaxes(out, -1, 1) if not seq_last else out


def group_batch_norm(p, x, group_size: int, seq_last: bool = False,
                     share_along_sequence_dim: bool = False,
                     eps: float = 1e-5):
    """NBC2 GroupBatchNorm (norm.py:93-227): statistics over the group of
    narrow-band sequences (group, H) or (group, Seq, H) per group.

    x: (B·group, Seq, H) [seq_last=False] or (B·group, H, Seq).
    """
    shape0 = x.shape
    if x.ndim == 3:
        b = x.shape[0] // group_size
        x = x.reshape((b, group_size) + x.shape[1:])
    if seq_last:  # (B, G, H, Seq)
        axes = (1, 2, 3) if share_along_sequence_dim else (1, 2)
        wshape = (1, 1, -1, 1)
    else:         # (B, G, Seq, H)
        axes = (1, 2, 3) if share_along_sequence_dim else (1, 3)
        wshape = (1, 1, 1, -1)
    mean = jnp.mean(x, axes, keepdims=True)
    var = jnp.var(x, axes, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    out = out * p["weight"].reshape(wshape) + p["bias"].reshape(wshape)
    return out.reshape(shape0)


def new_norm(norm_type: str, dim_hidden: int, seq_last: bool,
             group_size: int | None = None, num_groups: int | None = None):
    """Factory returning (init_params, apply(params, x)) pairs
    (norm.py:230-247)."""
    t = norm_type
    if t.upper() == "LN":
        return (lambda: init_affine(dim_hidden),
                lambda p, x: layer_norm(p, x, seq_last))
    if t.upper() == "GBN" or t == "GBNShare":
        share = t == "GBNShare"
        return (lambda: init_affine(dim_hidden, seq_last),
                lambda p, x, gs=group_size: group_batch_norm(
                    p, x, gs, seq_last, share))
    if t.upper() == "BN":
        return (lambda: init_affine(dim_hidden),
                lambda p, x: batch_norm_1d(p, x, seq_last))
    if t.upper() == "GN":
        return (lambda: init_affine(dim_hidden),
                lambda p, x: group_norm(p, x, num_groups, seq_last))
    if t == "gLN":
        return (lambda: init_affine(dim_hidden, seq_last),
                lambda p, x: global_layer_norm(p, x, seq_last))
    raise ValueError(norm_type)


# ------------------------------------------------------- grouped linears


def _kaiming_uniform(key, shape, fan_in):
    gain = math.sqrt(2.0 / (1 + 5.0))        # a=sqrt(5) leaky-relu gain
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_linear_group(key, in_features: int, out_features: int,
                      num_groups: int, bias: bool = True):
    kw, kb = jax.random.split(key)
    p = {"weight": _kaiming_uniform(
        kw, (num_groups, out_features, in_features), in_features)}
    if bias:
        bound = 1 / math.sqrt(in_features)
        p["bias"] = jax.random.uniform(kb, (num_groups, out_features),
                                       jnp.float32, -bound, bound)
    return p


def linear_group(p, x):
    """x: [..., group, in] → [..., group, out] (linear_group.py:29-34)."""
    out = jnp.einsum("...gh,gkh->...gk", x, p["weight"])
    return out + p["bias"] if "bias" in p else out


def init_linear_group_shared(key, in_features: int, out_features: int,
                             num_groups: int, bias: bool = True):
    kw, kb = jax.random.split(key)
    p = {"weight": _kaiming_uniform(kw, (out_features, in_features),
                                    in_features)}
    if bias:
        bound = 1 / math.sqrt(in_features)
        p["bias"] = jax.random.uniform(kb, (num_groups, out_features),
                                       jnp.float32, -bound, bound)
    return p


def linear_group_shared(p, x):
    out = jnp.einsum("...gh,kh->...gk", x, p["weight"])
    return out + p["bias"] if "bias" in p else out


def init_conv1d_group(key, in_features: int, out_features: int,
                      num_groups: int, kernel_size: int,
                      bias: bool = True):
    kw, kb = jax.random.split(key)
    fan_in = in_features * kernel_size
    p = {"weight": _kaiming_uniform(
        kw, (num_groups, out_features, in_features, kernel_size), fan_in)}
    if bias:
        bound = 1 / math.sqrt(fan_in)
        p["bias"] = jax.random.uniform(kb, (num_groups, out_features),
                                       jnp.float32, -bound, bound)
    return p


def conv1d_group(p, x):
    """x: (B, T, G, F) → (B, T, G, O); per-group conv over time with
    'same' padding (linear_group.py:106-117)."""
    k = p["weight"].shape[-1]
    xp = jnp.pad(x, ((0, 0), (k // 2, k - 1 - k // 2), (0, 0), (0, 0)))
    t = x.shape[1]
    # windows[b, t, g, f, k]
    win = jnp.stack([xp[:, i: i + t] for i in range(k)], axis=-1)
    out = jnp.einsum("btgfk,gofk->btgo", win, p["weight"])
    return out + p["bias"] if "bias" in p else out


# --------------------------------------------------------- non-linears


def new_non_linear(non_linear_type: str, dim_hidden: int, seq_last: bool):
    """Factory returning (init_params, apply) (non_linear.py:19-33)."""
    t = non_linear_type.lower()
    if t == "prelu":
        axis = 1 if seq_last else -1

        def apply(p, x):
            shape = [1] * x.ndim
            shape[axis] = -1
            a = p["weight"].reshape(shape)
            return jnp.where(x >= 0, x, a * x)

        # explicit dtype: weak-typed inits change the jit signature after
        # one optimizer step (a silent full recompile mid-training)
        return (lambda: {"weight": jnp.full((dim_hidden,), 0.25,
                                            jnp.float32)}, apply)
    fns = {"silu": jax.nn.silu, "sigmoid": jax.nn.sigmoid,
           "relu": jax.nn.relu, "leakyrelu": lambda x: jax.nn.leaky_relu(x),
           "elu": jax.nn.elu}
    if t in fns:
        return (lambda: {}), (lambda p, x: fns[t](x))
    raise ValueError(non_linear_type)
