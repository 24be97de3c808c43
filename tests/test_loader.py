"""DataLoader / prefetch_to_device: determinism, overlap, errors."""
import time

import numpy as np
import pytest

from fnssl_tpu.data import DataLoader, prefetch_to_device


def _collate(items):
    return np.stack(items)


def _fetch(i):
    return np.full((3,), i, np.float32)


def test_loader_matches_serial_any_workers():
    sched = list(range(17))
    ref = [np.stack([_fetch(i) for i in sched[k:k + 4]])
           for k in range(0, 16, 4)]
    for workers in (0, 1, 3, 8):
        got = list(DataLoader(_fetch, sched, 4, _collate,
                              num_workers=workers, prefetch=2))
        assert len(got) == len(ref)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(g, r)


def test_loader_keep_last_and_len():
    sched = list(range(10))
    dl = DataLoader(_fetch, sched, 4, _collate, drop_last=False,
                    num_workers=2)
    batches = list(dl)
    assert [b.shape[0] for b in batches] == [4, 4, 2]
    assert len(dl) == 3
    assert len(DataLoader(_fetch, sched, 4, _collate)) == 2


def test_loader_deterministic_under_jittered_fetch():
    """Worker completion order must not change batch order."""
    rng = np.random.default_rng(0)
    delays = rng.uniform(0, 0.01, 32)

    def fetch(i):
        time.sleep(delays[i])
        return np.full((2,), i, np.float32)

    sched = list(range(32))
    got = list(DataLoader(fetch, sched, 4, _collate, num_workers=4,
                          prefetch=3))
    for k, b in enumerate(got):
        np.testing.assert_array_equal(b[:, 0], np.arange(4 * k, 4 * k + 4))


def test_loader_overlaps_consumer():
    """Producer (sleepy fetch) and consumer (sleepy step) overlap: total
    wall time well under the serial sum."""
    def fetch(i):
        time.sleep(0.02)
        return np.zeros((1,), np.float32)

    n_batches, bz = 6, 2
    sched = list(range(n_batches * bz))
    serial_estimate = n_batches * (bz * 0.02 + 0.04)  # fetches + steps
    t0 = time.time()
    for _ in DataLoader(fetch, sched, bz, _collate, num_workers=2,
                        prefetch=2):
        time.sleep(0.04)                               # device step
    overlapped = time.time() - t0
    assert overlapped < serial_estimate * 0.8, (overlapped, serial_estimate)


def test_loader_propagates_fetch_error():
    def fetch(i):
        if i == 5:
            raise ValueError("boom")
        return np.zeros((1,), np.float32)

    dl = DataLoader(fetch, list(range(8)), 2, _collate, num_workers=2)
    with pytest.raises(ValueError, match="boom"):
        list(dl)


def test_loader_early_break_cleans_up():
    dl = DataLoader(_fetch, list(range(100)), 2, _collate, num_workers=2,
                    prefetch=2)
    for k, b in enumerate(dl):
        if k == 3:
            break
    # a fresh iteration starts from the beginning, full determinism
    first = next(iter(dl))
    np.testing.assert_array_equal(first[:, 0], [0, 1])


def test_loader_early_break_does_not_block_on_inflight():
    """Breaking out of the iterator must not wait for slow in-flight
    assemblies (the old context-manager exit did shutdown(wait=True),
    blocking up to prefetch+1 ISM fetches)."""
    import time

    def slow_fetch(i):
        time.sleep(0.5)
        return np.full((4,), i, np.float32)

    dl = DataLoader(slow_fetch, list(range(40)), 2, _collate,
                    num_workers=2, prefetch=4)
    it = iter(dl)
    next(it)
    t0 = time.monotonic()
    it.close()  # generator close → finally → non-blocking shutdown
    assert time.monotonic() - t0 < 0.4


def test_prefetch_to_device_custom_put():
    """A custom ``put`` callable (the mesh shard_batch path) places every
    batch and preserves order."""
    placed = []

    def put(b):
        placed.append(b["x"][0])
        return b

    batches = [{"x": np.full((2,), i, np.float32)} for i in range(4)]
    out = list(prefetch_to_device(iter(batches), size=2, put=put))
    assert [int(b["x"][0]) for b in out] == [0, 1, 2, 3]
    assert [int(v) for v in placed] == [0, 1, 2, 3]


def test_prefetch_to_device_values_and_order():
    batches = [{"x": np.full((2,), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]),
                                      np.full((2,), i, np.float32))


def test_prefetch_to_device_with_sharding():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from fnssl_tpu.parallel import make_mesh

    mesh = make_mesh()
    sharding = NamedSharding(mesh, PartitionSpec("data"))
    batches = [np.arange(8, dtype=np.float32) + i for i in range(3)]
    out = list(prefetch_to_device(iter(batches), size=1,
                                  sharding=sharding))
    for i, b in enumerate(out):
        assert b.sharding == sharding
        np.testing.assert_array_equal(np.asarray(b),
                                      np.arange(8, dtype=np.float32) + i)
