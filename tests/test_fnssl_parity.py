"""FN-SSL model parity vs the reference torch implementation + streaming."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fnssl_tpu.models import (
    lstm, init_lstm_params, FNSSLConfig, init_fnssl_params,
    init_fnssl_state, fnssl_apply)
from fnssl_tpu.train.convert import (
    torch_state_dict_to_params, params_to_torch_state_dict)

from reference_oracle import load_fnssl_torch


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_matches_torch(rng, bidirectional):
    b, t, i, h = 5, 17, 12, 8
    params = init_lstm_params(jax.random.key(0), i, h, bidirectional)
    x = rng.standard_normal((b, t, i)).astype(np.float32)

    ref = torch.nn.LSTM(i, h, batch_first=True, bidirectional=bidirectional)
    ref.load_state_dict({k: torch.from_numpy(np.asarray(v))
                         for k, v in params.items()})
    with torch.no_grad():
        want, (h_want, c_want) = ref(torch.from_numpy(x))

    got, state = lstm(params, jnp.asarray(x), bidirectional=bidirectional)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(state.h), h_want.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(state.c), c_want.numpy(),
                               atol=2e-5)


def test_lstm_streaming_chunks_match_one_shot(rng):
    b, t, i, h = 3, 40, 6, 10
    params = init_lstm_params(jax.random.key(1), i, h)
    x = rng.standard_normal((b, t, i)).astype(np.float32)
    full, _ = lstm(params, jnp.asarray(x))
    outs, state = [], None
    for lo in range(0, t, 13):
        out, state = lstm(params, jnp.asarray(x[:, lo:lo + 13]), state=state)
        outs.append(np.asarray(out))
    np.testing.assert_allclose(np.concatenate(outs, 1), np.asarray(full),
                               atol=1e-5)


@pytest.mark.parametrize("is_online", [True, False])
def test_fnssl_matches_reference(rng, is_online):
    """Bit-level (fp32 tolerance) parity against the reference FN_SSL."""
    cfg = FNSSLConfig(is_online=is_online)
    params = init_fnssl_params(jax.random.key(2), cfg)

    fn_ssl_cls = load_fnssl_torch()
    ref = fn_ssl_cls(is_online=is_online)
    ref.load_state_dict(params_to_torch_state_dict(params))
    ref.eval()

    x = rng.standard_normal((2, 4, 32, 24)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(fnssl_apply(params, jnp.asarray(x), cfg=cfg))
    assert got.shape == want.shape == (2, 2, 64)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fnssl_roundtrip_through_torch_state_dict():
    cfg = FNSSLConfig()
    params = init_fnssl_params(jax.random.key(3), cfg)
    sd = params_to_torch_state_dict(params)
    back = torch_state_dict_to_params(sd)
    for leaf_a, leaf_b in zip(jax.tree.leaves(params),
                              jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(leaf_a),
                                      np.asarray(leaf_b))


def test_fnssl_streaming_equals_offline(rng):
    """Chunked causal inference with carried state == one-shot forward."""
    cfg = FNSSLConfig(is_online=True)
    params = init_fnssl_params(jax.random.key(4), cfg)
    nb, nf, nt = 2, 16, 48
    x = rng.standard_normal((nb, 4, nf, nt)).astype(np.float32)

    full = np.asarray(fnssl_apply(params, jnp.asarray(x), cfg=cfg))

    state = init_fnssl_state(nb, nf, cfg)
    outs = []
    for lo in range(0, nt, 12):  # chunk = one output frame (12 stft frames)
        out, state = fnssl_apply(params, jnp.asarray(x[..., lo:lo + 12]),
                                 cfg=cfg, state=state, return_state=True)
        outs.append(np.asarray(out))
    np.testing.assert_allclose(np.concatenate(outs, 1), full, atol=1e-5)


def test_fnssl_doa_head_shape(rng):
    cfg = FNSSLConfig(is_doa=True)
    params = init_fnssl_params(jax.random.key(5), cfg)
    x = rng.standard_normal((1, 4, 256, 24)).astype(np.float32)
    out = fnssl_apply(params, jnp.asarray(x), cfg=cfg)
    assert out.shape == (1, 2, 180)
