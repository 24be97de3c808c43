"""Retention parity vs reference torch + mode-equivalence self-tests;
Mamba parallel≡step equivalence (the reference's retention.py:303-326
test pattern applied to both sequence modules)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fnssl_tpu.models.mamba import (
    MambaConfig, init_mamba_params, init_mamba_state, mamba_apply,
    mamba_step)
from fnssl_tpu.models.retention import (
    RetentionConfig, RetNetRelPos, init_retention_params,
    retention_chunkwise, retention_parallel, retention_recurrent_step)
from fnssl_tpu.train.convert import params_to_torch_state_dict
from tests.reference_oracle import load_reference_module


@pytest.fixture(scope="module")
def ref_ret():
    return load_reference_module("IPDnet2/arch/base/retention.py",
                                 "ref_retention")


@pytest.mark.parametrize("share_qk", [False, True])
def test_retention_parallel_matches_reference(ref_ret, rng, share_qk):
    cfg = RetentionConfig(embed_dim=32, num_heads=4, share_qk=share_qk)
    params = init_retention_params(jax.random.PRNGKey(0), cfg)
    ref = ref_ret.MultiScaleRetention(embed_dim=32, num_heads=4,
                                      value_factor=2,
                                      share_qk=share_qk).eval()
    ref.load_state_dict(params_to_torch_state_dict(params))

    pos = RetNetRelPos(32, 4, recurrent_chunk_size=8)
    ref_pos = ref_ret.RetNetRelPos(32, 4, recurrent_chunk_size=8)
    slen = 21
    x = rng.standard_normal((3, slen, 32)).astype(np.float32)

    with torch.no_grad():
        r = ref(torch.from_numpy(x.copy()), ref_pos(slen)).numpy()
    m = np.asarray(retention_parallel(params, jnp.asarray(x),
                                      pos(slen), cfg))
    np.testing.assert_allclose(m, r, rtol=1e-4, atol=1e-5)


def test_retention_chunkwise_matches_reference(ref_ret, rng):
    cfg = RetentionConfig(embed_dim=32, num_heads=4)
    params = init_retention_params(jax.random.PRNGKey(1), cfg)
    ref = ref_ret.MultiScaleRetention(embed_dim=32, num_heads=4).eval()
    ref.load_state_dict(params_to_torch_state_dict(params))
    pos = RetNetRelPos(32, 4, recurrent_chunk_size=8)
    ref_pos = ref_ret.RetNetRelPos(32, 4, recurrent_chunk_size=8)
    slen = 21  # not a multiple of the chunk → exercises padding
    x = rng.standard_normal((2, slen, 32)).astype(np.float32)
    with torch.no_grad():
        r = ref(torch.from_numpy(x.copy()),
                ref_pos(slen, chunkwise_recurrent=True),
                chunkwise_recurrent=True).numpy()
    m = np.asarray(retention_chunkwise(params, jnp.asarray(x),
                                       pos(slen, chunkwise_recurrent=True),
                                       cfg))
    np.testing.assert_allclose(m, r, rtol=1e-4, atol=1e-5)


def test_retention_three_mode_equivalence(rng):
    """parallel == chunkwise == per-step recurrent (retention.py:303-326)."""
    cfg = RetentionConfig(embed_dim=24, num_heads=4)
    params = init_retention_params(jax.random.PRNGKey(2), cfg)
    pos = RetNetRelPos(24, 4, recurrent_chunk_size=10)
    slen = 30
    x = jnp.asarray(rng.standard_normal((2, slen, 24)).astype(np.float32))

    y_par = retention_parallel(params, x, pos(slen), cfg)
    # chunkwise differs from parallel only by its cross-chunk rescaling
    # approximation (~1e-2), same as the torch reference
    y_chunk = retention_chunkwise(params, x,
                                  pos(slen, chunkwise_recurrent=True), cfg)
    np.testing.assert_allclose(np.asarray(y_chunk), np.asarray(y_par),
                               rtol=0.05, atol=0.02)
    state = None
    ys = []
    for t in range(slen):
        # pos index t+1 → rotary angle·t, matching the parallel table row
        # (the reference's recurrent path is off by one AND broadcasts
        # only the first angle component — see theta_shift docstring)
        y, state = retention_recurrent_step(
            params, x[:, t: t + 1], pos(t + 1, activate_recurrent=True),
            cfg, state)
        ys.append(np.asarray(y))
    y_rec = np.concatenate(ys, axis=1)
    np.testing.assert_allclose(y_rec, np.asarray(y_par), rtol=0.05,
                               atol=0.02)


def test_mamba_parallel_equals_step(rng):
    """associative-scan full sequence == chunked streaming with carry."""
    cfg = MambaConfig(d_model=16, d_state=8, d_conv=4)
    params = init_mamba_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((3, 20, 16)).astype(np.float32))
    full = np.asarray(mamba_apply(params, x, cfg))
    assert np.isfinite(full).all()

    state = init_mamba_state(3, cfg)
    outs = []
    for t0 in range(0, 20, 5):
        y, state = mamba_step(params, x[:, t0:t0 + 5], cfg, state)
        outs.append(np.asarray(y))
    streamed = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(streamed, full, rtol=1e-4, atol=1e-5)

    # per-frame streaming too
    state = init_mamba_state(3, cfg)
    outs = []
    for t in range(20):
        y, state = mamba_step(params, x[:, t:t + 1], cfg, state)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), full,
                               rtol=1e-4, atol=1e-5)


def test_mamba_causality(rng):
    """Changing future inputs must not change past outputs."""
    cfg = MambaConfig(d_model=12, d_state=4)
    params = init_mamba_params(jax.random.PRNGKey(1), cfg)
    x = rng.standard_normal((1, 16, 12)).astype(np.float32)
    y1 = np.asarray(mamba_apply(params, jnp.asarray(x), cfg))
    x2 = x.copy()
    x2[:, 10:] += 100.0
    y2 = np.asarray(mamba_apply(params, jnp.asarray(x2), cfg))
    np.testing.assert_allclose(y1[:, :10], y2[:, :10], rtol=1e-5,
                               atol=1e-6)
    assert np.abs(y1[:, 10:] - y2[:, 10:]).max() > 1e-3


def test_mamba_matches_independent_torch_loop(rng):
    """Cross-validate the selective-scan math against an independent
    step-by-step torch implementation of the published S6 recurrence,
    using the same (mamba_ssm-named) parameters."""
    import torch

    cfg = MambaConfig(d_model=8, d_state=4, d_conv=3)
    params = init_mamba_params(jax.random.PRNGKey(5), cfg)
    b, t = 2, 10
    x = rng.standard_normal((b, t, 8)).astype(np.float32)

    mine = np.asarray(mamba_apply(params, jnp.asarray(x), cfg))

    p = {k: (torch.from_numpy(np.asarray(v).copy())
             if not isinstance(v, dict) else
             {k2: torch.from_numpy(np.asarray(v2).copy())
              for k2, v2 in v.items()}) for k, v in params.items()}
    u = torch.from_numpy(x.copy())
    with torch.no_grad():
        xz = u @ p["in_proj"]["weight"].T
        xin, z = xz.chunk(2, dim=-1)
        # depthwise causal conv + silu
        di, k = cfg.d_inner, cfg.d_conv
        w = p["conv1d"]["weight"][:, 0, :]
        xpad = torch.nn.functional.pad(xin.transpose(1, 2), (k - 1, 0))
        conv = sum(xpad[:, :, i: i + t] * w[None, :, i: i + 1]
                   for i in range(k)) + p["conv1d"]["bias"][None, :, None]
        xc = torch.nn.functional.silu(conv.transpose(1, 2))
        x_dbl = xc @ p["x_proj"]["weight"].T
        dt, bmat, cmat = torch.split(
            x_dbl, [cfg.dt_rank, cfg.d_state, cfg.d_state], dim=-1)
        delta = torch.nn.functional.softplus(
            dt @ p["dt_proj"]["weight"].T + p["dt_proj"]["bias"])
        a = -torch.exp(p["A_log"])
        h = torch.zeros(b, di, cfg.d_state)
        ys = []
        for i in range(t):
            da = torch.exp(delta[:, i, :, None] * a)
            h = da * h + (delta[:, i] * xc[:, i])[..., None] \
                * bmat[:, i, None, :]
            ys.append((h @ cmat[:, i, :, None]).squeeze(-1)
                      + p["D"] * xc[:, i])
        y = torch.stack(ys, dim=1) * torch.nn.functional.silu(z)
        ref = (y @ p["out_proj"]["weight"].T).numpy()
    np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-5)
