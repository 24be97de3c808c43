"""Multi-process CPU data-parallel worker (spawned by test_distributed).

One rank of a 2-process × N-local-device simulation of the reference's
DDP training (SURVEY.md §2.9, IPDnet2/sampler.py:20-97): initializes the
jax.distributed runtime, checks rank gating, runs broadcast_from_primary
for real across processes, takes one data-parallel FN-SSL train step on
a global mesh spanning both processes, and dumps everything to JSON for
the parent test to cross-check.

Usage: python distributed_worker.py RANK WORLD PORT LOCAL_DEVICES OUT.json
"""
import json
import os
import sys


def main():
    rank, world = int(sys.argv[1]), int(sys.argv[2])
    port, local_dev, out = sys.argv[3], int(sys.argv[4]), sys.argv[5]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_dev}"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from fnssl_tpu.parallel import (
        host_local_slice, make_mesh, replicate_params, shard_batch)
    from fnssl_tpu.parallel.distributed import (
        broadcast_from_primary, initialize, is_primary, sync_global_devices)

    initialize(f"localhost:{port}", world, rank)
    assert jax.process_count() == world, jax.process_count()
    assert jax.process_index() == rank
    assert len(jax.devices()) == world * local_dev
    assert is_primary() == (rank == 0)

    # real cross-process broadcast: each rank offers a different value;
    # everyone must end up with rank 0's
    offered = np.full((4,), float(rank + 7), np.float32)
    received = np.asarray(broadcast_from_primary(offered))

    # deterministic per-rank data schedule (rank/world from the runtime)
    sched = host_local_slice(10, epoch=0, seed=2)

    # one DP train step over the global mesh; every process feeds only
    # its local rows of the same deterministic global batch
    from fnssl_tpu.models.fnssl import FNSSLConfig, init_fnssl_params
    from fnssl_tpu.train import (
        init_train_state, make_optimizer, make_train_step)
    from fnssl_tpu.train.tasks import make_fnssl_task, synthetic_fnssl_batch

    n_global = world * local_dev
    cfg = FNSSLConfig()
    task = make_fnssl_task(cfg)
    tx = make_optimizer("adam", base_lr=1e-3, gamma=0.8988,
                        steps_per_epoch=1)
    params = init_fnssl_params(jax.random.PRNGKey(0), cfg)  # same seed ⇒
    state = init_train_state(params, tx)                    # same values
    step = make_train_step(task.loss_fn, tx, donate=False)

    gbatch = synthetic_fnssl_batch(nb=n_global, t_s=0.25)
    rows = slice(rank * local_dev, (rank + 1) * local_dev)
    local = {k: v[rows] for k, v in gbatch.items()}
    mesh = make_mesh()
    with mesh:
        state = replicate_params(state, mesh)
        batch = shard_batch(local, mesh)
        state, loss = step(state, batch, jax.random.PRNGKey(1))
        loss = float(jax.device_get(loss))
        # one replicated-param leaf fingerprint after the update
        leaf = np.asarray(
            jax.device_get(jax.tree_util.tree_leaves(state.params)[0]))
    sync_global_devices("done")

    # The REAL Learner/checkpoint path over the process-spanning mesh
    # (VERDICT r4 #8): both ranks drive Learner.fit over the shared
    # log dir — coordination barrier, orbax cross-process checkpoint
    # save, rank-gated logging — then a fresh Learner resumes from the
    # shared checkpoint and re-evaluates. All ranks must agree.
    from fnssl_tpu.train.learner import EarlyStopping, Learner

    ldir = os.path.join(os.path.dirname(out), "learner_run")
    lrn = Learner(task.loss_fn, params, lr=1e-3, lr_gamma=1.0,
                  log_dir=ldir, use_mesh=True,
                  early_stopping=EarlyStopping(0), seed=5)
    hist = lrn.fit(lambda e: [local], lambda e: [local], epochs=2)
    lrn.close()
    lrn2 = Learner(task.loss_fn, params, lr=1e-3, lr_gamma=1.0,
                   log_dir=ldir, use_mesh=True,
                   early_stopping=EarlyStopping(0), seed=5)
    resumed_epoch = lrn2.resume()
    resumed_valid = lrn2.eval_epoch([local])["loss"]
    lrn2.close()

    with open(out, "w") as f:
        json.dump({
            "rank": rank,
            "received_broadcast": received.tolist(),
            "sched": sched,
            "loss": loss,
            "param_fingerprint": float(np.abs(leaf).sum()),
            "learner_history": hist,
            "resumed_epoch": resumed_epoch,
            "resumed_valid": resumed_valid,
        }, f)


if __name__ == "__main__":
    main()
