"""Device-mesh data parallelism.

The reference's entire distributed story is data parallelism over NCCL
(torch DDP / DataParallel, SURVEY.md §2.9). The TPU-native equivalent is a
1-D ``jax.sharding.Mesh`` over the ``data`` axis: the batch is sharded, the
parameters are replicated, and XLA inserts the gradient all-reduce over ICI
when the loss is jitted with these shardings — no hand-written collectives.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``;
``host_local_slice`` reproduces the reference's deterministic per-rank data
sharding (IPDnet2/sampler.py:20-97 semantics).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place every array leaf of a batch pytree batch-sharded on the mesh.

    Single-process: leaves are the GLOBAL batch. Multi-process
    (``jax.distributed.initialize``'d): each process passes its LOCAL
    rows (the ``host_local_slice`` share) and they are assembled into
    global arrays without any cross-host copy.
    """
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_params(params, mesh: Mesh):
    """Replicate every leaf on all mesh devices. Multi-process: every
    process must hold identical values (same-seed init or
    ``broadcast_from_primary``)."""
    sh = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x), np.shape(x)), params)
    return jax.tree.map(lambda x: jax.device_put(x, sh), params)


def host_local_slice(num_items: int, epoch: int, seed: int = 2,
                     process_index: int | None = None,
                     process_count: int | None = None,
                     shuffle: bool = True) -> list[tuple[int, int]]:
    """Deterministic per-host (index, item_seed) schedule.

    Reproduces MyDistributedSampler semantics (IPDnet2/sampler.py:20-97):
    every host derives the same epoch-seeded permutation, pads to a multiple
    of the world size, takes a strided slice, and pairs each index with a
    per-item seed so on-the-fly augmentation is reproducible across ranks
    and resumes.
    """
    rank = jax.process_index() if process_index is None else process_index
    world = jax.process_count() if process_count is None else process_count
    g = np.random.default_rng(seed + epoch)
    order = (g.permutation(num_items) if shuffle
             else np.arange(num_items))
    item_seeds = g.integers(0, 2 ** 31 - 1, size=num_items)
    total = -(-num_items // world) * world
    if total > num_items:  # pad by wrapping, like DistributedSampler
        pad = total - num_items
        order = np.concatenate([order, order[:pad]])
        item_seeds = np.concatenate([item_seeds, item_seeds[:pad]])
    return [(int(order[i]), int(item_seeds[i]))
            for i in range(rank, total, world)]


FREQ_AXIS = "freq"


def make_mesh_2d(n_data: int, n_freq: int, devices=None,
                 axis_names: tuple[str, str] = (DATA_AXIS, FREQ_AXIS)
                 ) -> Mesh:
    """2-D (data × freq) mesh — model/sequence parallelism over the
    frequency axis, beyond the reference's DDP-only story (SURVEY §2.9).

    The narrow-band architecture makes frequency the natural second
    sharding axis: IPDnet2's time modules run per frequency band
    (independent), its grouped frequency convolutions need only a k-wide
    halo, and the full-band module needs one gather over F. All of those
    collectives are inserted by XLA's SPMD partitioner from sharding
    annotations alone — no hand-written halo exchange (the
    "annotate-and-let-XLA-partition" recipe).
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[:n_data * n_freq])
    return Mesh(devices.reshape(n_data, n_freq), axis_names)


def freq_sharded_input(mesh: Mesh, x,
                       data_axis: str = DATA_AXIS,
                       freq_axis: str = FREQ_AXIS):
    """Place a (nb, C, nf, nt) network input batch-sharded on ``data``
    and frequency-sharded on ``freq`` (the run_IPDnet2 input layout)."""
    return jax.device_put(
        x, NamedSharding(mesh, P(data_axis, None, freq_axis, None)))
