"""2-D (data × freq) sharding: model parallelism over the frequency axis.

The reference's only distributed mode is DDP (SURVEY §2.9). Here the
narrow-band IPDnet2 forward also shards over frequency: XLA's SPMD
partitioner inserts the halo exchange for the grouped frequency convs
and the gather for the full-band module from input shardings alone.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fnssl_tpu.models.spatialnet import (SpatialNetConfig,
                                         init_spatialnet_params,
                                         spatialnet_apply)
from fnssl_tpu.parallel import freq_sharded_input, make_mesh_2d

CFG = SpatialNetConfig(dim_input=4, dim_output=8, num_layers=2,
                       num_freqs=32, dim_hidden=32, dim_squeeze=4,
                       fre_compression_ratio=16)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_freq_sharded_spatialnet_matches_single_device(rng, mesh_shape):
    params = init_spatialnet_params(jax.random.PRNGKey(0), CFG)
    x = rng.standard_normal((2, CFG.dim_input, CFG.num_freqs, 10)
                            ).astype(np.float32)

    ref = np.asarray(spatialnet_apply(params, jnp.asarray(x), cfg=CFG))

    mesh = make_mesh_2d(*mesh_shape)
    xs = freq_sharded_input(mesh, x)
    assert len(xs.sharding.device_set) == 8
    with mesh:
        out = spatialnet_apply(params, xs, cfg=CFG)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_freq_sharded_ipdnet2_full_train_step(rng):
    """The COMPLETE IPDnet2 training step (fused STFT preprocess +
    near-field DPIPD2 targets + PIT loss + AdamW update) runs on a 2-D
    (data × freq) mesh via the task's ``feats_sharding`` hook and
    produces the same loss and updated params as the unsharded step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fnssl_tpu.models.spatialnet import (SpatialNetConfig,
                                             init_spatialnet_params)
    from fnssl_tpu.parallel import make_mesh_2d, shard_batch
    from fnssl_tpu.train.step import (init_train_state, make_optimizer,
                                      make_train_step)
    from fnssl_tpu.train.tasks import make_ipdnet2_task

    mic = np.array([[0.0, 0.0, 0.0], [0.03, 0.0, 0.0], [0.0, 0.03, 0.0]])
    cfg = SpatialNetConfig(dim_input=6, dim_output=8, num_layers=2,
                           dim_squeeze=4, num_freqs=256, dim_hidden=16,
                           conv_groups=8, d_state=4, mamba_conv=4)
    nb, ns = 2, 2
    batch = {
        "mic_sig": rng.standard_normal((nb, 8000, 3)).astype(np.float32),
        "azi_deg": rng.uniform(0, 180, (nb, 5, ns)).astype(np.float32),
        "distance": np.full((nb, 5, ns), 1.5, np.float32),
        "vad": np.ones((nb, 5, ns), np.float32),
        "mic_pos": np.tile(mic[None], (nb, 1, 1)).astype(np.float32),
    }
    params = init_spatialnet_params(jax.random.PRNGKey(3), cfg)

    def one_step(feats_sharding, placed_batch, placed_params):
        task = make_ipdnet2_task(cfg=cfg, mic_location=mic,
                                 feats_sharding=feats_sharding)
        tx = make_optimizer("adamw", 5e-4, 0.975, 1, grad_clip=5.0)
        state = init_train_state(placed_params, tx)
        step = make_train_step(task.loss_fn, tx, donate=False)
        return step(state, placed_batch, None)

    ref_state, ref_loss = one_step(None, batch, params)

    mesh = make_mesh_2d(2, 4)
    fsh = NamedSharding(mesh, P("data", None, "freq", None))
    with mesh:
        from fnssl_tpu.parallel import replicate_params
        sh_state, sh_loss = one_step(fsh, shard_batch(batch, mesh),
                                     replicate_params(params, mesh))

    np.testing.assert_allclose(float(sh_loss), float(ref_loss),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(sh_state.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-6)


def test_freq_sharded_training_step(rng):
    """Grad of a freq+data-sharded loss matches the unsharded gradient
    (psum over both axes inserted by XLA)."""
    params = init_spatialnet_params(jax.random.PRNGKey(0), CFG)
    x = rng.standard_normal((2, CFG.dim_input, CFG.num_freqs, 10)
                            ).astype(np.float32)

    def loss(p, xx):
        return jnp.mean(spatialnet_apply(p, xx, cfg=CFG) ** 2)

    g_ref = jax.grad(loss)(params, jnp.asarray(x))
    mesh = make_mesh_2d(2, 4)
    with mesh:
        g_sh = jax.grad(loss)(params, freq_sharded_input(mesh, x))
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-5)
