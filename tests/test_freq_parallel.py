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
