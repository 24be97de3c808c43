"""Input-pipeline overlap: prefetching batch loader + device prefetch.

The reference feeds every trainer from ``torch.utils.data.DataLoader(...,
num_workers=N)`` (FN-SSL/Train.py:94-101, Lightning/main.py:83-117,
IPDnet2/run_IPDnet2.py:60-77): batch assembly runs in worker processes so
host data generation overlaps GPU compute. The TPU-native equivalent here
is two composable pieces:

  * ``DataLoader`` — assembles batches on a thread pool, ``prefetch``
    batches ahead of the consumer, and yields them in deterministic
    schedule order (worker completion order never leaks into batch
    order, unlike torch's ``shuffle=True`` + worker racing). Threads
    beat processes in this stack: the hot host work — the C++/OpenMP
    ISM engine, soundfile reads, and large numpy ops — all release the
    GIL, and threads avoid re-importing/re-initializing JAX in children
    (forked workers inherit TPU client handles and can wedge the
    runtime).
  * ``prefetch_to_device`` — moves ready batches to the accelerator
    ``size`` steps ahead (optionally with a sharding), so the host→HBM
    transfer of batch t+1 rides under the device step at t.

Both are pure iterator combinators: ``Learner.fit`` consumes them
unchanged, and ``num_workers=0`` reproduces the serial path exactly.
"""
from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Sequence


class DataLoader:
    """Deterministic prefetching batch loader.

    Args:
      fetch: ``fetch(entry) -> sample`` — called once per schedule entry
        (an index, or whatever ``schedule`` holds, e.g. the
        ``(index, seed)`` pairs of ``host_local_slice``).
      schedule: this epoch's ordered entries (already sharded/shuffled).
      batch_size: samples per batch.
      collate: ``collate([samples]) -> batch``.
      num_workers: assembly threads; 0 = fully serial (no queue, no
        threads — bit-identical control flow to a python loop).
      prefetch: batches kept in flight beyond the one being consumed.
      drop_last: drop a ragged final batch (the reference's fixed-shape
        training contract; keep it for eval so no sample is lost).

    Iterating yields batches in schedule order; any worker exception is
    re-raised at the consumer at that batch's position.
    """

    def __init__(self, fetch: Callable, schedule: Sequence,
                 batch_size: int, collate: Callable, *,
                 num_workers: int = 2, prefetch: int = 2,
                 drop_last: bool = True):
        if batch_size <= 0:
            raise ValueError("batch_size must be positive")
        self.fetch = fetch
        self.schedule = list(schedule)
        self.batch_size = batch_size
        self.collate = collate
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last

    def _batch_entries(self):
        bz = self.batch_size
        end = len(self.schedule) - (bz - 1 if self.drop_last else 0)
        for i in range(0, max(end, 0), bz):
            yield self.schedule[i:i + bz]

    def _assemble(self, entries):
        return self.collate([self.fetch(e) for e in entries])

    def __len__(self) -> int:
        n, bz = len(self.schedule), self.batch_size
        return n // bz if self.drop_last else -(-n // bz)

    def __iter__(self) -> Iterator:
        if self.num_workers <= 0:
            for entries in self._batch_entries():
                yield self._assemble(entries)
            return
        # Submission order == yield order: determinism by construction.
        pool = ThreadPoolExecutor(self.num_workers)
        pending = collections.deque()
        entry_iter = self._batch_entries()
        try:
            for entries in entry_iter:
                pending.append(pool.submit(self._assemble, entries))
                if len(pending) > self.prefetch:
                    break
            while pending:
                batch = pending.popleft().result()
                nxt = next(entry_iter, None)
                if nxt is not None:
                    pending.append(pool.submit(self._assemble, nxt))
                yield batch
            pool.shutdown(wait=True)
        finally:
            # Consumer bailed early (break / KeyboardInterrupt): drop
            # queued work and do NOT wait for in-flight assemblies —
            # an on-the-fly ISM fetch can hold the pool for seconds.
            pool.shutdown(wait=False, cancel_futures=True)


def prefetch_to_device(batches: Iterable, size: int = 2,
                       sharding=None, put: Callable | None = None
                       ) -> Iterator:
    """Keep ``size`` batches resident on the accelerator ahead of the
    consumer, so host→HBM transfers overlap the device step.

    ``sharding`` (e.g. a data-axis ``NamedSharding``) places each batch
    directly in its distributed layout — the DP analogue of the
    reference's ``pin_memory`` + ``.cuda(non_blocking=True)``. A custom
    ``put`` callable overrides placement entirely (e.g. ``shard_batch``
    for multi-process global-array assembly).
    """
    import jax

    if put is None:
        def put(b):
            return jax.device_put(b, sharding) if sharding is not None \
                else jax.device_put(b)

    queue = collections.deque()
    for b in batches:
        queue.append(put(b))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
