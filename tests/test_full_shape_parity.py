"""Full-scale parity tests (VERDICT r1 weak #2 / next #8).

The regular parity suite runs at toy shapes; these run each model at its
reference production shape so shape-dependent bugs (pooling remainders,
pad edges, freq/time-compression boundaries) cannot hide:

  * FN-SSL  (nb 2, 4 ch-feats, nf 256, nt 298 = 4.79 s) vs torch oracle
  * IPDnet  (nb 1, nf 256, nt 280 = 4.5 s) vs torch oracle, online +
    offline chunked (n_seg 312 > nt exercises the pad-and-crop path)
  * IPDnet2 flagship (nb 1, 10 feats, nf 256, nt 200 = 4 s @ hop 320):
    streaming ≡ one-shot at full scale (the mamba path has no torch
    oracle here — mamba_ssm is CUDA-only — so self-consistency is the
    full-shape gate; module-level parity lives in test_spatialnet*.py)

Marked slow: minutes on the CPU container.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fnssl_tpu.models import (
    FNSSLConfig, fnssl_apply, init_fnssl_params)
from fnssl_tpu.models.ipdnet import (
    IPDnetConfig, init_ipdnet_params, ipdnet_apply)
from fnssl_tpu.models.spatialnet import (
    SpatialNetConfig, init_spatialnet_params, init_spatialnet_state,
    spatialnet_apply)
from fnssl_tpu.train.convert import params_to_torch_state_dict

from tests.reference_oracle import load_fnssl_torch, load_reference_module

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("is_online", [True, False])
def test_fnssl_full_shape_parity(rng, is_online):
    """(2, 4, 256, 298) — the exact Train.py:46-55 training shape."""
    cfg = FNSSLConfig(is_online=is_online)
    params = init_fnssl_params(jax.random.key(10), cfg)
    ref = load_fnssl_torch()(is_online=is_online)
    ref.load_state_dict(params_to_torch_state_dict(params))
    ref.eval()
    x = rng.standard_normal((2, 4, 256, 298)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.copy())).numpy()
    got = np.asarray(fnssl_apply(params, jnp.asarray(x), cfg=cfg))
    assert got.shape == want.shape == (2, 298 // 12, 512)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


@pytest.fixture(scope="module")
def ipdnet_ref_mod():
    return load_reference_module(
        "IPDnet/FixedAarryIPDnet.py", "ref_ipdnet_full",
        extra_sys_path="/root/reference/IPDnet",
        stub_modules=("soundfile", "webrtcvad", "gpuRIR"))


def test_ipdnet_full_shape_parity(ipdnet_ref_mod, rng):
    """(1, 4, 256, 280) — 4.5 s at hop 256 (IPDnet/Simu.py scale)."""
    cfg = IPDnetConfig(is_online=True)
    params = init_ipdnet_params(jax.random.PRNGKey(11), cfg)
    ref = ipdnet_ref_mod.IPDnet(is_online=True).eval()
    ref.load_state_dict(params_to_torch_state_dict(params))
    x = rng.standard_normal((1, 4, 256, 280)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.copy())).numpy()
    got = np.asarray(ipdnet_apply(params, jnp.asarray(x), cfg=cfg))
    assert got.shape == want.shape == (1, 280 // 12, 512, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


def test_ipdnet_full_shape_offline_chunked(ipdnet_ref_mod, rng):
    """Offline chunked inference at full shape: nt 280 < n_seg 312
    exercises pad_segments' pad-and-crop edge exactly as runIPDnetOff
    does on 4.5 s utterances."""
    cfg = IPDnetConfig(is_online=False)
    params = init_ipdnet_params(jax.random.PRNGKey(12), cfg)
    ref = ipdnet_ref_mod.IPDnet(is_online=False).eval()
    ref.load_state_dict(params_to_torch_state_dict(params))
    x = rng.standard_normal((1, 4, 256, 280)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.copy()),
                   offline_inference=True).numpy()
    got = np.asarray(ipdnet_apply(params, jnp.asarray(x), cfg=cfg,
                                  offline_inference=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


def test_spatialnet_flagship_full_shape_streaming(rng):
    """Flagship OnlineSpatialNet (8 layers, hidden 96, nf 256) at the
    4 s production shape: chunked streaming with carried state must
    reproduce the one-shot forward across every compression boundary."""
    cfg = SpatialNetConfig()
    params = init_spatialnet_params(jax.random.PRNGKey(13), cfg)
    nb, nt = 1, 200
    x = rng.standard_normal((nb, cfg.dim_input, cfg.num_freqs, nt)
                            ).astype(np.float32)
    full = np.asarray(spatialnet_apply(params, jnp.asarray(x), cfg=cfg))
    assert full.shape == (nb, nt // 5, 512, 4, 2)
    assert np.isfinite(full).all()
    state = init_spatialnet_state(nb, cfg)
    outs = []
    step = 25  # 5 compressed frames per chunk
    for t0 in range(0, nt, step):
        o, state = spatialnet_apply(
            params, jnp.asarray(x[..., t0:t0 + step]), cfg=cfg,
            state=state, return_state=True)
        outs.append(np.asarray(o))
    streamed = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(streamed, full, rtol=1e-4, atol=2e-5)
