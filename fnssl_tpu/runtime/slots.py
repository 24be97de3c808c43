"""Slot-batched streaming execution — TPU-first multi-stream serving.

One connection = one chunk step (batch 1) wastes the chip: the measured
16-stream batched chunk step costs the same wall time as one stream
(BASELINE.md: 253× aggregate real-time at 16 concurrent IPDnet2
streams). This module turns that measurement into a serving primitive:

  * a FIXED number of slots S with a handful of static program TIERS
    (1, 4, …, S — powers of 4): each tick runs the smallest compiled
    tier covering the active slots, so one connection pays a 1-slot
    program, not an S-slot one, and XLA still never recompiles as
    connections come and go (≤ log₄S programs, compiled lazily);
  * per-slot streaming state lives stacked in the batch axis; slot
    acquire/release is a masked state reset INSIDE the jitted step
    (no host-side state surgery, no per-connection retrace);
  * a slot with no pending chunk this tick keeps its old state (masked
    state carry), so slow and fast streams interleave freely;
  * submissions batch opportunistically: the dispatcher waits
    ``batch_window_s`` after the first pending chunk to gather more.

The batch-axis bookkeeping is model-agnostic: the slot axis of every
state leaf is discovered by comparing ``init_state(1)`` vs
``init_state(2)`` shapes (each leaf scales at exactly one axis, checked
at construction), so any present or future model family with an
``init_state(nb)`` works unmodified.
"""
from __future__ import annotations

import threading
from concurrent.futures import Future
from typing import Callable

import numpy as np


def _slot_axes(init_state_fn):
    """Tree of per-leaf slot-axis indices, via the shape delta between
    nb=1 and nb=2 states. Leaves that don't scale with nb get -1."""
    import jax

    s1 = jax.eval_shape(lambda: init_state_fn(1))
    s2 = jax.eval_shape(lambda: init_state_fn(2))

    def axis(a, b):
        diffs = [i for i, (x, y) in enumerate(zip(a.shape, b.shape))
                 if x != y]
        if not diffs:
            return -1
        if len(diffs) != 1 or b.shape[diffs[0]] != 2 * a.shape[diffs[0]]:
            raise ValueError(
                f"state leaf {a.shape}→{b.shape} does not scale "
                "linearly at one axis; slot batching unsupported")
        return diffs[0]

    return jax.tree.map(axis, s1, s2)


def _per_slot_where(mask, a, b, axis, slots):
    """where(mask_per_slot, a, b) along a leaf's slot axis. The slot
    axis holds slots-major blocks of size leaf.shape[axis]//slots
    (row-major flattening of (nb, k, ...) everywhere in the models)."""
    import jax.numpy as jnp

    if axis < 0:
        return a
    k = a.shape[axis] // slots
    av = jnp.moveaxis(a, axis, 0)
    bv = jnp.moveaxis(b, axis, 0)
    rest = av.shape[1:]
    av = av.reshape((slots, k) + rest)
    bv = bv.reshape((slots, k) + rest)
    m = mask.reshape((slots,) + (1,) * (av.ndim - 1))
    out = jnp.where(m, av, bv).reshape((slots * k,) + rest)
    return jnp.moveaxis(out, 0, axis)


def _gather_slots(leaf, ids, ax: int, slots: int):
    """Take ``ids``' slot blocks out of a full-pool leaf along its slot
    axis: (…, S·k, …) → (…, s·k, …)."""
    import jax.numpy as jnp

    if ax < 0:
        return leaf
    k = leaf.shape[ax] // slots
    v = jnp.moveaxis(leaf, ax, 0)
    v = v.reshape((slots, k) + v.shape[1:])
    sub = v[ids].reshape((ids.shape[0] * k,) + v.shape[2:])
    return jnp.moveaxis(sub, 0, ax)


def _scatter_slots(full, sub, ids, ax: int, slots: int):
    """Write ``sub``'s slot blocks back into the full-pool leaf at
    ``ids`` (inverse of :func:`_gather_slots`); ids must be distinct."""
    import jax.numpy as jnp

    if ax < 0:
        return full
    k = full.shape[ax] // slots
    fv = jnp.moveaxis(full, ax, 0)
    rest = fv.shape[1:]
    fv = fv.reshape((slots, k) + rest)
    sv = jnp.moveaxis(sub, ax, 0).reshape((ids.shape[0], k) + rest)
    fv = fv.at[ids].set(sv)
    return jnp.moveaxis(fv.reshape((slots * k,) + rest), 0, ax)


class SlotBatchedStepper:
    """S-slot batched stateful chunk step with masked reset/carry and
    TIERED program sizes.

    A fixed-S program pays for all S slots on every tick — at one active
    connection that's a 16× oversized device step (measured: the r4
    single-conn TCP RTT). Instead the pool state stays stacked at full S
    while each tick runs the SMALLEST compiled tier s ≥ #active-slots:

      sub     = gather(state, ids)                    # (s·k) slot blocks
      sub     = where(reset,  fresh_s, sub)           # new streams
      out, st = apply(params, feats_s, sub)
      sub     = where(active, st,      sub)           # carry padded rows
      state   = scatter(state, sub, ids)

    Everything (gather/where/apply/scatter) is ONE jitted program per
    tier; tier sizes are powers of 4 clamped to S (1, 4, 16, …, S), so
    at most ~log₄S compilations ever happen, lazily on first use.
    Padded rows carry distinct idle slot ids (scatter needs unique
    indices) with active=False, so their state scatters back unchanged.
    """

    def __init__(self, apply_fn: Callable, params, init_state_fn,
                 slots: int):
        import jax
        import jax.numpy as jnp

        self.slots = slots
        self._axes = _slot_axes(init_state_fn)
        self._state = init_state_fn(slots)
        self._fresh1 = init_state_fn(1)
        self._apply_fn = apply_fn
        self._params = params
        self._jnp = jnp
        # upload features in the params' compute dtype: a bf16-served
        # model casts inputs to bf16 anyway (train/precision.py policy),
        # and halving the host→device payload is real money on a
        # tunneled chip (786→393 KB per 16-slot FN-SSL tick)
        fdts = [l.dtype for l in jax.tree.leaves(params)
                if hasattr(l, "dtype")
                and jnp.issubdtype(l.dtype, jnp.floating)]
        self._feat_dtype = (jnp.bfloat16 if fdts and all(
            d == jnp.bfloat16 for d in fdts) else np.float32)
        self.tier_sizes = []
        s = 1
        while s < slots:
            self.tier_sizes.append(s)
            s *= 4
        self.tier_sizes.append(slots)
        self._tiers: dict[int, Callable] = {}

    def _make_tier(self, s: int) -> Callable:
        import jax

        jnp = self._jnp
        S = self.slots
        axes = self._axes
        apply_fn = self._apply_fn
        fresh_sub = jax.tree.map(
            lambda f, ax: (f if ax < 0 else
                           jnp.concatenate([f] * s, axis=ax)),
            self._fresh1, axes)

        def _step(params, full, feats, ids, reset, active):
            sub = jax.tree.map(
                lambda leaf, ax: _gather_slots(leaf, ids, ax, S),
                full, axes)
            sub = jax.tree.map(
                lambda fr, st, ax: _per_slot_where(reset, fr, st, ax, s),
                fresh_sub, sub, axes)
            out, stepped = apply_fn(params, feats, state=sub,
                                    return_state=True)
            sub = jax.tree.map(
                lambda new, old, ax: _per_slot_where(active, new, old,
                                                     ax, s),
                stepped, sub, axes)
            full = jax.tree.map(
                lambda fl, sb, ax: _scatter_slots(fl, sb, ids, ax, S),
                full, sub, axes)
            return out, full

        return jax.jit(_step)

    def step_slots(self, ids: np.ndarray, feats, reset_mask: np.ndarray):
        """Run one tick for the ``len(ids)`` active slots.

        feats: (len(ids)·rows, C, nf, k) in ids order. Returns the
        outputs for exactly those rows (padding stripped)."""
        k = len(ids)
        s = next(t for t in self.tier_sizes if t >= k)
        rows = feats.shape[0] // max(k, 1)
        if s not in self._tiers:
            self._tiers[s] = self._make_tier(s)
        if s > k:
            taken = set(int(i) for i in ids)
            pad = [i for i in range(self.slots)
                   if i not in taken][:s - k]
            ids = np.concatenate([np.asarray(ids, np.int32),
                                  np.asarray(pad, np.int32)])
            feats = np.concatenate(
                [feats, np.zeros(((s - k) * rows,) + feats.shape[1:],
                                 feats.dtype)])
            reset_mask = np.concatenate(
                [np.asarray(reset_mask, bool), np.zeros(s - k, bool)])
        active = np.arange(s) < k
        out, self._state = self._tiers[s](
            self._params, self._state,
            np.asarray(feats).astype(self._feat_dtype),
            np.asarray(ids, np.int32), np.asarray(reset_mask, bool),
            active)
        return out[:k * rows]


class BatchedStreamPool:
    """Connection-facing pool over a SlotBatchedStepper.

    ``session()`` leases a slot and returns a callable usable as a
    StreamingLocalizer ``model_step`` (with ``.close()`` to free the
    slot). Concurrent sessions' chunks ride the SAME device program.

    Args:
      apply_fn/params/init_state_fn: the pure model step family
        (runtime.export._resolve provides these per model name).
      feats_shape: per-stream chunk shape (rows, C, nf, k) — rows is
        the pair count P (1 for 2-mic models).
      slots: max concurrent streams.
      batch_window_s: the dispatcher's gather bound. A tick fires as
        soon as EVERY leased slot has a pending chunk (the common case
        under load — zero added latency), else ``batch_window_s`` after
        the first pending chunk. The bound only bites when some leased
        stream is idle this tick (a live client between pushes), so it
        prices latency-vs-occupancy only for mixed-rate pools: 10 ms
        default = 5% of a 192 ms chunk, while a missed batching
        opportunity costs a whole extra device tick (~40-60 ms on a
        tunneled chip — the measured r4/r5 16-conn TCP aggregate
        collapse, occupancy 8.3/16 at a 2 ms fixed window).
    """

    def __init__(self, apply_fn, params, init_state_fn, feats_shape,
                 slots: int = 8, batch_window_s: float = 0.010):
        rows = int(feats_shape[0])
        self.rows, self.slots = rows, slots
        self.stepper = SlotBatchedStepper(
            apply_fn, params, lambda nb: init_state_fn(nb * rows), slots)
        self._feats_shape = tuple(feats_shape)
        self._free = list(range(slots))
        self._needs_reset = np.zeros(slots, bool)
        self._pending: dict[int, tuple[np.ndarray, Future]] = {}
        self._lock = threading.Lock()
        self._event = threading.Event()
        self._stop = False
        self.window = batch_window_s
        self.ticks = 0
        self._thread = threading.Thread(target=self._dispatch,
                                        daemon=True)
        self._thread.start()

    # ------------------------------------------------------------ leases

    def session(self):
        with self._lock:
            if not self._free:
                raise RuntimeError(f"all {self.slots} slots leased")
            slot = self._free.pop(0)
            self._needs_reset[slot] = True
        return _SlotSession(self, slot)

    def _release(self, slot: int):
        with self._lock:
            self._free.append(slot)

    def warmup(self, verbose: bool = False):
        """Compile every tier program ahead of traffic — a tier's first
        use otherwise pays its jit compile (tens of seconds on a remote
        chip) inside a live request when occupancy first crosses its
        boundary. Runs each tier once with active=False (state scatters
        back unchanged), so it is a pure compile+execute no-op.
        ``verbose`` prints per-tier compile wall times (the compiles
        dominate cold-start; on a contended chip they can run minutes,
        so long-running harnesses want the progress line)."""
        import time as _time

        st = self.stepper
        for s in st.tier_sizes:
            t0 = _time.perf_counter()
            if s not in st._tiers:
                st._tiers[s] = st._make_tier(s)
            ids = np.arange(s, dtype=np.int32)
            feats = np.zeros((s * self.rows,) + self._feats_shape[1:],
                             np.float32).astype(st._feat_dtype)
            out, st._state = st._tiers[s](
                st._params, st._state, feats, ids,
                np.zeros(s, bool), np.zeros(s, bool))
            np.asarray(out)                      # block until done
            if verbose:
                print(f"slot-pool tier {s} warm: "
                      f"{_time.perf_counter() - t0:.1f}s", flush=True)
        return self

    def close(self):
        self._stop = True
        self._event.set()
        self._thread.join(timeout=5.0)

    # --------------------------------------------------------- dispatch

    def _submit(self, slot: int, feats: np.ndarray) -> Future:
        if self._stop:
            raise RuntimeError("pool closed")   # else the future hangs
        fut: Future = Future()
        with self._lock:
            assert slot not in self._pending, \
                "one in-flight chunk per slot (submit blocks on result)"
            self._pending[slot] = (np.asarray(feats, np.float32), fut)
        self._event.set()
        return fut

    def _dispatch(self):
        import time
        while not self._stop:
            if not self._event.wait(timeout=0.2):
                continue
            # gather: fire the moment every leased slot has submitted
            # (no latency tax under full load), else at the window bound
            deadline = time.perf_counter() + self.window
            while not self._stop:
                with self._lock:
                    n_pending = len(self._pending)
                    leased = self.slots - len(self._free)
                if n_pending >= leased or n_pending >= self.slots:
                    break
                if time.perf_counter() >= deadline:
                    break
                time.sleep(0.0005)
            with self._lock:
                if not self._pending:
                    self._event.clear()
                    continue
                batch, self._pending = self._pending, {}
                reset = self._needs_reset.copy()
                for slot in batch:
                    self._needs_reset[slot] = False
                self._event.clear()
            rows = self.rows
            ids = np.fromiter(batch.keys(), np.int32, len(batch))
            feats = np.concatenate(
                [fa for fa, _ in batch.values()]).astype(
                    np.float32, copy=False)
            # reset exactly the slots stepping for the first time this
            # lease; untouched leased slots keep reset pending
            try:
                out = np.asarray(
                    self.stepper.step_slots(ids, feats, reset[ids]))
                self.ticks += 1
                for i, (_, fut) in enumerate(batch.values()):
                    fut.set_result(out[i * rows:(i + 1) * rows])
            except Exception as e:               # propagate to callers
                for _, fut in batch.values():
                    fut.set_exception(e)


class _SlotSession:
    """A leased slot: callable chunk step for StreamingLocalizer."""

    def __init__(self, pool: BatchedStreamPool, slot: int):
        self._pool, self._slot = pool, slot
        self._open = True

    def __call__(self, feats):
        if not self._open:
            raise RuntimeError("session closed")
        return self._pool._submit(self._slot, feats).result()

    def close(self):
        if self._open:
            self._open = False
            self._pool._release(self._slot)
