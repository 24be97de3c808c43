"""bf16 mixed-precision policy (train/precision.py) — the AMP analogue.

Reference: FN-SSL trains with torch AMP (Learner.py:109-115 GradScaler,
Opt.py use_amp). bf16 needs no loss scaling; the policy keeps master
params fp32 and casts model compute to bf16.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fnssl_tpu.models.fnssl import FNSSLConfig, init_fnssl_params
from fnssl_tpu.train import init_train_state, make_optimizer, make_train_step
from fnssl_tpu.train.precision import cast_floats, wrap_apply
from fnssl_tpu.train.tasks import make_fnssl_task, synthetic_fnssl_batch

CFG = FNSSLConfig()


def test_cast_floats_selective():
    tree = {"w": jnp.ones((2,), jnp.float32), "i": jnp.ones((2,), jnp.int32),
            "c": jnp.ones((2,), jnp.complex64)}
    out = cast_floats(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["i"].dtype == jnp.int32
    assert out["c"].dtype == jnp.complex64


def test_wrap_apply_fp32_is_identity():
    fn = lambda p, x: x  # noqa: E731
    assert wrap_apply(fn, "fp32") is fn
    with pytest.raises(ValueError):
        wrap_apply(fn, "fp16")


def _run_steps(precision, n_steps=4, nb=2):
    task = make_fnssl_task(CFG, precision=precision)
    tx = make_optimizer("adam", base_lr=1e-3, gamma=0.8988,
                        steps_per_epoch=1)
    params = init_fnssl_params(jax.random.PRNGKey(0), CFG)
    state = init_train_state(params, tx)
    step = make_train_step(task.loss_fn, tx, donate=False)
    batch = synthetic_fnssl_batch(nb=nb, t_s=0.5)
    losses = []
    for i in range(n_steps):
        state, loss = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    return losses, state


def test_bf16_tracks_fp32_training():
    """N bf16 steps track fp32 within tolerance; loss decreases; master
    params and gradients stay fp32."""
    l32, s32 = _run_steps("fp32")
    l16, s16 = _run_steps("bf16")
    # loss and its decrease agree to bf16 resolution (~3 decimal digits)
    np.testing.assert_allclose(l16, l32, rtol=0.02, atol=0.01)
    assert l16[-1] < l16[0]
    # master params remain fp32 and stay close to the fp32 run's params
    leaves16 = jax.tree_util.tree_leaves(s16.params)
    assert all(p.dtype == jnp.float32 for p in leaves16)
    flat32 = jax.tree_util.tree_leaves(s32.params)
    diffs = [float(jnp.max(jnp.abs(a - b)))
             for a, b in zip(leaves16, flat32)]
    # Adam's normalized update moves ≈lr per step whatever the gradient,
    # so bf16 direction noise can drift params by up to ~lr·n_steps.
    assert max(diffs) < 4 * 1e-3 * 2, max(diffs)


def test_bf16_loss_and_grads_fp32():
    task = make_fnssl_task(CFG, precision="bf16")
    params = init_fnssl_params(jax.random.PRNGKey(1), CFG)
    batch = synthetic_fnssl_batch(nb=1, t_s=0.3)
    loss, grads = jax.value_and_grad(task.loss_fn)(
        params, batch, jax.random.PRNGKey(0))
    assert loss.dtype == jnp.float32
    gl = jax.tree_util.tree_leaves(grads)
    assert all(g.dtype == jnp.float32 for g in gl)
    assert all(bool(jnp.isfinite(g).all()) for g in gl)


def test_bf16_composes_with_remat():
    task = make_fnssl_task(CFG, precision="bf16", remat=True)
    params = init_fnssl_params(jax.random.PRNGKey(2), CFG)
    batch = synthetic_fnssl_batch(nb=1, t_s=0.3)
    loss, grads = jax.value_and_grad(task.loss_fn)(
        params, batch, jax.random.PRNGKey(0))
    # identical numerics to the non-remat bf16 path
    task2 = make_fnssl_task(CFG, precision="bf16")
    loss2, grads2 = jax.value_and_grad(task2.loss_fn)(
        params, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(grads2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_bf16_ipdnet2_spatialnet():
    """Policy works through the jitted spatialnet (static cfg) too."""
    from fnssl_tpu.models.spatialnet import (
        SpatialNetConfig, init_spatialnet_params)
    from fnssl_tpu.train.tasks import make_ipdnet2_task

    mic = np.array([[0.0, 0.0, 0.0], [0.03, 0.0, 0.0], [0.0, 0.03, 0.0]])
    cfg = SpatialNetConfig(dim_input=6, dim_output=8, num_layers=2,
                           dim_squeeze=4, num_freqs=256, dim_hidden=16,
                           conv_groups=8, d_state=4, mamba_conv=4)
    task = make_ipdnet2_task(cfg=cfg, mic_location=mic, precision="bf16")
    params = init_spatialnet_params(jax.random.PRNGKey(3), cfg)
    nb, ns = 1, 2
    rng = np.random.default_rng(0)
    batch = {
        "mic_sig": rng.standard_normal((nb, 8000, 3)).astype(np.float32),
        "azi_deg": rng.uniform(0, 180, (nb, 5, ns)).astype(np.float32),
        "distance": np.full((nb, 5, ns), 1.5, np.float32),
        "vad": np.ones((nb, 5, ns), np.float32),
        "mic_pos": np.tile(mic[None], (nb, 1, 1)).astype(np.float32),
    }
    loss, grads = jax.value_and_grad(task.loss_fn)(
        params, batch, jax.random.PRNGKey(0))
    assert loss.dtype == jnp.float32 and bool(jnp.isfinite(loss))
    assert all(g.dtype == jnp.float32
               for g in jax.tree_util.tree_leaves(grads))


def test_bf16_ipdnet2_task_tracks_fp32():
    """The bf16 policy composes with the IPDnet2 near-field task (the
    fused preprocess keeps targets fp32; only model compute drops)."""
    from fnssl_tpu.data.arrays import audiowu_high_array_geometry
    from fnssl_tpu.models.spatialnet import init_spatialnet_params
    from fnssl_tpu.train.tasks import make_ipdnet2_task

    rng = np.random.default_rng(0)
    mic = audiowu_high_array_geometry()[[0, 1, 3, 5, 7]]
    batch = {
        "mic_sig": rng.standard_normal((1, 8000, 5)).astype(np.float32),
        "azi_deg": rng.uniform(0, 180, (1, 5, 2)).astype(np.float32),
        "distance": rng.uniform(0.5, 3.0, (1, 5, 2)).astype(np.float32),
        "vad": np.ones((1, 5, 2), np.float32),
        "mic_pos": mic[None].astype(np.float32),
    }
    losses = {}
    for prec in ("fp32", "bf16"):
        task = make_ipdnet2_task(precision=prec)
        params = init_spatialnet_params(jax.random.PRNGKey(0), task.cfg)
        tx = make_optimizer("adamw", 5e-4, 0.975, 1, grad_clip=5.0)
        state = init_train_state(params, tx)
        step = make_train_step(task.loss_fn, tx, donate=False)
        ls = []
        for i in range(3):
            state, loss = step(state, batch, None)
            ls.append(float(loss))
        losses[prec] = ls
    assert all(np.isfinite(losses["bf16"]))
    assert losses["bf16"][-1] < losses["bf16"][0]   # it learns
    np.testing.assert_allclose(losses["bf16"], losses["fp32"],
                               rtol=0.05, atol=0.02)
