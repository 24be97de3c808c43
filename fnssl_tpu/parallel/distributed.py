"""Multi-host data-parallel initialization.

The reference's multi-GPU story is single-node DDP (SURVEY.md §2.9); the
TPU-native multi-host equivalent is ``jax.distributed.initialize`` +
a global mesh whose data axis spans every chip on every host, with
rank-zero-style gating helpers for checkpoint/log IO.
"""
from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """Join the multi-host runtime. No-ops on a single process.

    On TPU pods the arguments are discovered from the environment; pass
    them explicitly for CPU/GPU multi-process simulation
    (jax.distributed semantics).
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (ValueError, RuntimeError) as e:  # already initialized / 1 proc
        if "already" not in str(e).lower():
            raise


def is_primary() -> bool:
    """Rank-zero gating for checkpoint/log IO (the reference's
    ``is_global_zero``, Lightning/main.py:138-142)."""
    return jax.process_index() == 0


def sync_global_devices(name: str = "barrier"):
    """Cross-host barrier (multihost_utils)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def broadcast_from_primary(pytree):
    """Replicate host-0 values to all hosts (deterministic init)."""
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(pytree)
