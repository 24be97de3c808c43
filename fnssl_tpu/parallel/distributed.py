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


_BARRIER_SEQ = [0]


def coordination_barrier(name: str = "fnssl", timeout_s: float = 900.0):
    """Align all processes via the coordination service (gRPC), NOT the
    Gloo collectives context. No-op on a single process.

    Why this exists: XLA's CPU Gloo backend initializes its collectives
    context through a key-value exchange with a HARDCODED 30 s timeout
    (gloo_kv_store); on an oversubscribed host two ranks can reach their
    FIRST collective more than 30 s apart (one still paying imports or
    first-compile) and the whole world dies with "Gloo context
    initialization failed: GetKeyValue() timed out". Calling this before
    the first collective-backed component (orbax's checkpoint-directory
    sync is typically it) bounds the inter-rank skew at that point to
    milliseconds, with a timeout WE control. Observed live: the --spawn
    e2e test failing exactly this way under full-test-suite load.

    LOCKSTEP REQUIREMENT: barrier ids come from a process-local
    sequence counter, so every rank must call this the same number of
    times over its process lifetime. Restarting a single rank resets
    its counter and deadlocks it against surviving peers — the CLI
    therefore refuses single-rank self-healing restarts
    (--stall-restart-s/--rss-restart-gb) when num_processes > 1.
    """
    if jax.process_count() <= 1:
        return
    _BARRIER_SEQ[0] += 1
    barrier_id = f"{name}_{_BARRIER_SEQ[0]}"
    try:
        from jax._src import distributed as _dist
        client = _dist.global_state.client
    except Exception:
        client = None
    if client is None:  # internal API moved: degrade to the gloo barrier
        sync_global_devices(barrier_id)
        return
    client.wait_at_barrier(barrier_id, int(timeout_s * 1000))


def broadcast_from_primary(pytree):
    """Replicate host-0 values to all hosts (deterministic init)."""
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(pytree)
