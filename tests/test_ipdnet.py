"""IPDnet parity vs reference torch + streaming≡offline equivalence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fnssl_tpu.models.ipdnet import (
    IPDnetConfig, VariableIPDnetConfig, init_ipdnet_params,
    init_ipdnet_state, init_variable_ipdnet_params, ipdnet_apply,
    variable_ipdnet_apply)
from fnssl_tpu.train.convert import params_to_torch_state_dict
from tests.reference_oracle import load_reference_module


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_module(
        "IPDnet/FixedAarryIPDnet.py", "ref_ipdnet",
        extra_sys_path="/root/reference/IPDnet",
        stub_modules=("soundfile", "webrtcvad", "gpuRIR"))


@pytest.mark.parametrize("is_online", [True, False])
def test_ipdnet_matches_reference(ref_mod, rng, is_online):
    cfg = IPDnetConfig(is_online=is_online)
    params = init_ipdnet_params(jax.random.PRNGKey(0), cfg)
    ref = ref_mod.IPDnet(is_online=is_online).eval()
    ref.load_state_dict(params_to_torch_state_dict(params))

    x = rng.standard_normal((2, 4, 32, 24)).astype(np.float32)
    with torch.no_grad():
        r = ref(torch.from_numpy(x.copy())).numpy()
    m = np.asarray(ipdnet_apply(params, jnp.asarray(x), cfg=cfg))
    assert m.shape == r.shape == (2, 2, 64, 1, 2)
    np.testing.assert_allclose(m, r, rtol=1e-4, atol=1e-5)


def test_ipdnet_offline_chunked_matches_reference(ref_mod, rng):
    cfg = IPDnetConfig(is_online=False, n_seg=24)
    params = init_ipdnet_params(jax.random.PRNGKey(1), cfg)
    ref = ref_mod.IPDnet(is_online=False, n_seg=24).eval()
    ref.load_state_dict(params_to_torch_state_dict(params))
    x = rng.standard_normal((1, 4, 16, 48)).astype(np.float32)
    with torch.no_grad():
        r = ref(torch.from_numpy(x.copy()), offline_inference=True).numpy()
    m = np.asarray(ipdnet_apply(params, jnp.asarray(x), cfg=cfg,
                                offline_inference=True))
    assert m.shape == r.shape
    np.testing.assert_allclose(m, r, rtol=1e-4, atol=1e-5)


def test_ipdnet_streaming_equals_oneshot(rng):
    """Chunked causal inference with carried state == one-shot forward."""
    cfg = IPDnetConfig(is_online=True)
    params = init_ipdnet_params(jax.random.PRNGKey(2), cfg)
    nb, nf, nt = 1, 16, 48
    x = rng.standard_normal((nb, 4, nf, nt)).astype(np.float32)

    full = np.asarray(ipdnet_apply(params, jnp.asarray(x), cfg=cfg))

    state = init_ipdnet_state(nb, nf, cfg)
    chunks = []
    for t0 in range(0, nt, 12):
        out, state = ipdnet_apply(params, jnp.asarray(x[..., t0:t0 + 12]),
                                  cfg=cfg, state=state, return_state=True)
        chunks.append(np.asarray(out))
    streamed = np.concatenate(chunks, axis=1)
    np.testing.assert_allclose(streamed, full, rtol=1e-4, atol=1e-5)


def test_variable_ipdnet_shapes_and_finite(rng):
    """The shipped reference file crashes (narrLstm input-size bug,
    VariableArrayIPDnet.py:32 — verified RuntimeError), so parity is
    against the intended contract: output (1, nt/12, 2nf, npair, 2)."""
    cfg = VariableIPDnetConfig()
    params = init_variable_ipdnet_params(jax.random.PRNGKey(3), cfg)
    x = rng.standard_normal((3, 4, 16, 24)).astype(np.float32)
    out = variable_ipdnet_apply(params, jnp.asarray(x), cfg=cfg)
    assert out.shape == (1, 2, 32, 3, 2)
    assert bool(jnp.isfinite(out).all())
    # pair-permutation equivariance of the mean-embedding design: permuting
    # pairs permutes the pair axis of the output identically
    perm = [2, 0, 1]
    out_p = variable_ipdnet_apply(params, jnp.asarray(x[perm]), cfg=cfg)
    np.testing.assert_allclose(np.asarray(out_p),
                               np.asarray(out)[:, :, :, perm],
                               rtol=1e-4, atol=1e-5)


def test_variable_ipdnet_batched_equals_per_utterance(rng):
    """Same-topology batching (VERDICT r4 #4): nb utterances stacked in
    nb-major pair groups through ONE forward must equal each utterance
    run alone — the pair means must not leak across utterances."""
    cfg = VariableIPDnetConfig()
    params = init_variable_ipdnet_params(jax.random.PRNGKey(3), cfg)
    nb, npair = 3, 3
    xs = [rng.standard_normal((npair, 4, 16, 24)).astype(np.float32)
          for _ in range(nb)]
    batched = variable_ipdnet_apply(params, jnp.asarray(np.concatenate(xs)),
                                    cfg=cfg, npair=npair)
    assert batched.shape == (nb, 2, 32, npair, 2)
    for b, x in enumerate(xs):
        solo = variable_ipdnet_apply(params, jnp.asarray(x), cfg=cfg)
        np.testing.assert_allclose(np.asarray(batched[b:b + 1]),
                                   np.asarray(solo), rtol=1e-4,
                                   atol=1e-5, err_msg=f"utterance {b}")


def test_ipdnet_task_loss_decreases():
    import jax as _jax

    from fnssl_tpu.train import (
        init_train_state, make_optimizer, make_train_step)
    from fnssl_tpu.train.tasks import make_ipdnet_task, synthetic_fnssl_batch

    task = make_ipdnet_task()
    tx = make_optimizer("adam", base_lr=5e-4, gamma=0.975,
                        steps_per_epoch=1)
    params = init_ipdnet_params(_jax.random.PRNGKey(0), task.cfg)
    state = init_train_state(params, tx)
    step = make_train_step(task.loss_fn, tx)
    batch = synthetic_fnssl_batch(nb=2, t_s=0.25, ns=2)
    losses = []
    for i in range(3):
        state, loss = step(state, batch, _jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0], losses
