"""Lossless torch ↔ JAX parameter conversion.

The framework's parameter pytrees use the reference's state_dict names
verbatim (``block_1.fullLstm.weight_ih_l0`` → nested dicts), so conversion
is pure tree plumbing — no per-layer mapping tables (SURVEY.md §5.4).

Supported external formats:
  * torch state_dict (flat 'a.b.c' keys) — from either the raw-torch
    ``.tar`` checkpoints (key 'model') or Lightning ``.ckpt`` ('state_dict',
    keys prefixed 'arch.').
"""
from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np


def flat_to_nested(flat: Mapping[str, Any], strip_prefix: str = ""
                   ) -> dict[str, Any]:
    """'a.b.c' → nested dicts. Values pass through np.asarray → jnp."""
    out: dict[str, Any] = {}
    for key, val in flat.items():
        if strip_prefix and key.startswith(strip_prefix):
            key = key[len(strip_prefix):]
        parts = key.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(val))
    return out


def nested_to_flat(params: Mapping[str, Any], prefix: str = ""
                   ) -> dict[str, np.ndarray]:
    """Nested dicts → flat 'a.b.c' numpy dict (torch-loadable)."""
    out: dict[str, np.ndarray] = {}
    for key, val in params.items():
        name = f"{prefix}{key}"
        if isinstance(val, Mapping):
            out.update(nested_to_flat(val, name + "."))
        else:
            out[name] = np.asarray(val)
    return out


def torch_state_dict_to_params(state_dict: Mapping[str, Any],
                               strip_prefix: str = "") -> dict[str, Any]:
    """Convert a torch state_dict (tensors or arrays) to a param pytree.

    Pass ``strip_prefix='arch.'`` for Lightning checkpoints
    (reference: FN-SSL/Model.py:92-99 wrapper).
    """
    flat = {}
    for k, v in state_dict.items():
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else v
        flat[k] = v
    return flat_to_nested(flat, strip_prefix)


def params_to_torch_state_dict(params: Mapping[str, Any],
                               prefix: str = "") -> dict[str, Any]:
    """Param pytree → dict of torch tensors (imported lazily)."""
    import torch

    return {k: torch.from_numpy(v.copy())
            for k, v in nested_to_flat(params, prefix).items()}


def load_torch_tar(path: str) -> dict[str, Any]:
    """Load a raw-torch ``.tar`` checkpoint (Learner.py:285-315 format:
    {'epoch', 'max_score', 'model': state_dict[, 'scalar']}) into a param
    pytree. Returns (params, metadata)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    params = torch_state_dict_to_params(ckpt["model"])
    meta = {k: v for k, v in ckpt.items() if k != "model"}
    return params, meta


def load_lightning_ckpt(path: str, strip_prefix: str = "arch."
                        ) -> dict[str, Any]:
    """Load a Lightning ``.ckpt`` (state_dict keys prefixed 'arch.',
    FN-SSL/Model.py:92-99) into a param pytree. Returns (params, meta)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    params = torch_state_dict_to_params(ckpt["state_dict"], strip_prefix)
    meta = {k: ckpt[k] for k in ("epoch", "global_step")
            if k in ckpt}
    return params, meta


def save_torch_tar(path: str, params, epoch: int = 0,
                   max_score: float = 0.0, prefix: str = ""):
    """Write a raw-torch-compatible ``.tar`` so our trained params load
    in the reference framework (bidirectional interop)."""
    import torch

    torch.save({"epoch": epoch, "max_score": max_score,
                "model": params_to_torch_state_dict(params, prefix)}, path)
