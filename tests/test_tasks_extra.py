"""DOA-classification task, offline IPDnet task, checkpoint interop."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fnssl_tpu.models.fnssl import FNSSLConfig, init_fnssl_params
from fnssl_tpu.models.ipdnet import init_ipdnet_params
from fnssl_tpu.train import (
    init_train_state, make_optimizer, make_train_step)
from fnssl_tpu.train.convert import (
    load_lightning_ckpt, load_torch_tar, save_torch_tar)
from fnssl_tpu.train.tasks import (
    make_fnssl_task, make_ipdnet_offline_task, synthetic_fnssl_batch)


def test_fnssl_doa_classification_task_trains():
    cfg = FNSSLConfig(is_doa=True)
    task = make_fnssl_task(cfg)
    tx = make_optimizer("adam", 1e-3, 1.0, 1)
    params = init_fnssl_params(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params, tx)
    step = make_train_step(task.loss_fn, tx)
    batch = synthetic_fnssl_batch(nb=2, t_s=0.25)
    batch["doa"][:, :, 1] = np.abs(batch["doa"][:, :, 1])  # classes 0..179
    state, l0 = step(state, batch, jax.random.PRNGKey(0))
    state, l1 = step(state, batch, jax.random.PRNGKey(1))
    state, l2 = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite([l0, l1, l2]).all() and float(l2) < float(l0)


def test_doa_cls_decode():
    from fnssl_tpu.eval import predgt2doa_cls

    logits = np.full((1, 4, 180), -5.0, np.float32)
    logits[0, :, 42] = 5.0
    pred, _ = predgt2doa_cls(logits)
    assert pred["doa"].shape == (1, 4, 2, 1)
    np.testing.assert_allclose(np.degrees(np.asarray(pred["doa"][0, :, 1,
                                                                 0])),
                               42.0, atol=1e-4)


def test_ipdnet_offline_task_trains():
    task = make_ipdnet_offline_task()
    assert not task.cfg.is_online
    tx = make_optimizer("adam", 5e-4, 1.0, 1)
    params = init_ipdnet_params(jax.random.PRNGKey(0), task.cfg)
    state = init_train_state(params, tx)
    step = make_train_step(task.loss_fn, tx)
    batch = synthetic_fnssl_batch(nb=1, t_s=0.25, ns=2)
    state, l0 = step(state, batch, None)
    state, l1 = step(state, batch, None)
    assert np.isfinite([float(l0), float(l1)]).all()
    assert float(l1) < float(l0)


def test_torch_tar_roundtrip(tmp_path):
    """Our params → reference .tar format → back, bit-identical; and the
    file loads in plain torch."""
    import torch

    cfg = FNSSLConfig()
    params = init_fnssl_params(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "best_model.tar")
    save_torch_tar(path, params, epoch=7, max_score=-0.123)
    loaded, meta = load_torch_tar(path)
    assert meta["epoch"] == 7
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(params),
                   key=str),
            sorted(jax.tree_util.tree_leaves_with_path(loaded),
                   key=str)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert "model" in raw and "block_1.fullLstm.weight_ih_l0" in raw["model"]


def test_lightning_ckpt_loading(tmp_path):
    """A Lightning-format .ckpt (arch.-prefixed) loads losslessly."""
    import torch

    cfg = FNSSLConfig()
    params = init_fnssl_params(jax.random.PRNGKey(4), cfg)
    from fnssl_tpu.train.convert import params_to_torch_state_dict
    sd = {("arch." + k): v
          for k, v in params_to_torch_state_dict(params).items()}
    path = str(tmp_path / "last.ckpt")
    torch.save({"state_dict": sd, "epoch": 3, "global_step": 99}, path)
    loaded, meta = load_lightning_ckpt(path)
    assert meta == {"epoch": 3, "global_step": 99}
    flat_a = {k: np.asarray(v) for k, v in
              params_to_torch_state_dict(params).items()}
    flat_b = {k: np.asarray(v) for k, v in
              params_to_torch_state_dict(loaded).items()}
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_variable_ipdnet_task_trains():
    from fnssl_tpu.models.ipdnet import init_variable_ipdnet_params
    from fnssl_tpu.train.tasks import make_variable_ipdnet_task

    mic = np.array([[-0.05, 0, 0], [0.0, 0, 0], [0.05, 0, 0]])
    task = make_variable_ipdnet_task(mic_location=mic)
    tx = make_optimizer("adam", 5e-4, 1.0, 1)
    params = init_variable_ipdnet_params(jax.random.PRNGKey(0), task.cfg)
    state = init_train_state(params, tx)
    from fnssl_tpu.train import make_train_step
    step = make_train_step(task.loss_fn, tx)
    batch = synthetic_fnssl_batch(nb=1, t_s=0.25, nch=3, ns=2)
    state, l0 = step(state, batch, None)
    state, l1 = step(state, batch, None)
    assert np.isfinite([float(l0), float(l1)]).all()
    assert float(l1) < float(l0)


def test_fnssl_remat_task_matches_plain():
    """remat=True computes identical losses/gradients (just recomputed)."""
    cfg = FNSSLConfig()
    plain = make_fnssl_task(cfg)
    remat = make_fnssl_task(cfg, remat=True)
    params = init_fnssl_params(jax.random.PRNGKey(0), cfg)
    batch = synthetic_fnssl_batch(nb=1, t_s=0.25)
    l1 = float(plain.loss_fn(params, batch, None))
    l2 = float(remat.loss_fn(params, batch, None))
    assert l1 == l2
    g1 = jax.grad(lambda p: plain.loss_fn(p, batch, None))(params)
    g2 = jax.grad(lambda p: remat.loss_fn(p, batch, None))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
