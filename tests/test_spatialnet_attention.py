"""Parity for the dormant OnlineSpatialNet time-module paths.

The shipped IPDnet2 constructor hardcodes Mamba (IPDnet2.py:125-133), so
the MHSA / retention / T-ConvFFN branches are reachable only by patching a
built model — which is exactly what these tests do to the reference
oracle: stub mamba_ssm with a dummy Mamba so OnlineSpatialNet constructs,
then swap each layer's time modules for nn.MultiheadAttention /
MultiScaleRetention / a T-ConvFFN ModuleList, making the dormant ``_tsa``
(IPDnet2.py:183-202), ``_tconvffn`` (:204-221) and ``get_causal_mask``
(:370-399) paths live.

Documented reference bug (see COMPONENTS.md): ``_tsa`` calls
``nn.MultiheadAttention(..., need_weights=False, attn_mask=mask,
is_causal=True)``; torch's fast path then sets ``attn_mask=None``
(F.multi_head_attention_forward: is_causal + no key_padding_mask +
need_weights=False), so the attn_scope window and ALiBi decay are silently
discarded and the layer runs plain causal attention. (The inverted
``need_weights = False if hasattr(self, 'need_weights') ...`` guard at
IPDnet2.py:195 makes need_weights=True unreachable.)  Our framework
honours the mask; the reference behaviour is recovered with
``attn_scope >= T`` and ``rope != 'ALiBi'`` — which is how the full-model
parity test below is configured.
"""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from fnssl_tpu.models.attention import (
    MHSAConfig, causal_mask, init_mhsa_params, init_mhsa_state, mhsa_apply,
    mhsa_apply_streaming)
from fnssl_tpu.models.spatialnet import (
    SpatialNetConfig, get_causal_mask, init_spatialnet_params,
    init_spatialnet_state, spatialnet_apply)
from fnssl_tpu.train.convert import nested_to_flat
from tests.reference_oracle import load_reference_module


def _load_ref_with_mamba_stub():
    """Load IPDnet2.py with a constructible dummy mamba_ssm.Mamba."""
    stubs = {}
    mamba_mod = types.ModuleType("mamba_ssm")

    class DummyMamba(nn.Module):
        def __init__(self, d_model=None, d_state=None, d_conv=None,
                     layer_idx=None):
            super().__init__()

    mamba_mod.Mamba = DummyMamba
    utils_mod = types.ModuleType("mamba_ssm.utils")
    gen_mod = types.ModuleType("mamba_ssm.utils.generation")
    gen_mod.InferenceParams = type("InferenceParams", (), {})
    stubs["mamba_ssm"] = mamba_mod
    stubs["mamba_ssm.utils"] = utils_mod
    stubs["mamba_ssm.utils.generation"] = gen_mod
    added = [k for k in stubs if k not in sys.modules]
    sys.modules.update({k: v for k, v in stubs.items()
                        if k not in sys.modules})
    try:
        mod = load_reference_module(
            "IPDnet2/IPDnet2.py", "ref_ipdnet2_attn",
            extra_sys_path="/root/reference/IPDnet2",
            stub_modules=("soundfile", "webrtcvad", "gpuRIR"))
    finally:
        for k in added:
            del sys.modules[k]
    return mod


@pytest.fixture(scope="module")
def ref_mod():
    return _load_ref_with_mamba_stub()


def _ref_model(ref_mod, num_layers=2):
    return ref_mod.OnlineSpatialNet(
        dim_input=4, dim_output=4, num_layers=num_layers, dim_squeeze=4,
        num_freqs=16, encoder_kernel_size=5, dim_hidden=16, num_heads=2,
        attention="mamba(4,4)", fre_compression_ratio=16,
        time_compression_ratio=1, time_compression_layer=0).eval()


def _tconv_modulelist(ref_mod):
    """torch twin of init_tconvffn_params (keys 0/1/3/5)."""
    return nn.ModuleList([
        ref_mod.LayerNorm(seq_last=True, normalized_shape=16),
        nn.Conv1d(16, 32, 1), nn.SiLU(),
        ref_mod.CausalConv1d(32, 32, 3, groups=8), nn.SiLU(),
        nn.Conv1d(32, 16, 1)])


MY_CFG = dict(dim_input=4, dim_output=4, num_layers=2, dim_squeeze=4,
              num_freqs=16, dim_hidden=16, num_heads=2, conv_groups=8,
              time_compression_ratio=1, t_kernel_size=3, t_conv_groups=8,
              tconvffn_factor=2)


def _load_my_params_into_ref(model, params):
    flat = nested_to_flat(params)
    sd = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in flat.items()}
    model.load_state_dict(sd, strict=True)  # validates 1:1 naming too


# ---------------------------------------------------------------- masks


def test_get_causal_mask_matches_reference(ref_mod):
    model = _ref_model(ref_mod)
    model.attn_scope = 5
    model.rope = False
    ref = model.get_causal_mask(slen=9, device="cpu", batch_size=3).numpy()
    mine = causal_mask(9, 5)
    np.testing.assert_array_equal(mine, ref)


def test_get_causal_mask_alibi_matches_reference(ref_mod):
    model = _ref_model(ref_mod)
    model.attn_scope = 4
    model.rope = "ALiBi"
    ref = model.get_causal_mask(slen=7, device="cpu", batch_size=3).numpy()
    mine = causal_mask(7, 4, num_heads=2, alibi=True)     # (H, T, T)
    # reference tiles the per-head slopes over the batch (IPDnet2.py:374)
    np.testing.assert_allclose(np.tile(mine, (3, 1, 1)), ref, rtol=1e-6)


def test_reference_mhsa_call_drops_mask(ref_mod):
    """Guards the documented bug: the reference's exact _tsa call ignores
    the window mask (torch fast path nulls attn_mask when is_causal)."""
    torch.manual_seed(0)
    m = nn.MultiheadAttention(16, 2, batch_first=True).eval()
    x = torch.randn(3, 8, 16)
    mask = torch.from_numpy(causal_mask(8, 3))            # scope 3
    causal = torch.from_numpy(causal_mask(8, 8))          # pure causal
    with torch.no_grad():
        y_ref, _ = m(x, x, x, need_weights=False, attn_mask=mask,
                     is_causal=True)                      # IPDnet2.py:198
        y_causal, _ = m(x, x, x, need_weights=True, attn_mask=causal)
        y_masked, _ = m(x, x, x, need_weights=True, attn_mask=mask)
    assert torch.allclose(y_ref, y_causal, atol=1e-6)
    assert not torch.allclose(y_ref, y_masked, atol=1e-3)


# ----------------------------------------------------- MHSA module parity


@pytest.mark.parametrize("alibi", [False, True])
def test_mhsa_apply_matches_torch(alibi, rng):
    cfg = MHSAConfig(embed_dim=16, num_heads=2, attn_scope=3, alibi=alibi)
    params = init_mhsa_params(jax.random.PRNGKey(0), cfg)
    ref = nn.MultiheadAttention(16, 2, batch_first=True).eval()
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in nested_to_flat(params).items()}
    ref.load_state_dict(sd, strict=True)
    x = rng.standard_normal((3, 8, 16)).astype(np.float32)
    mask = causal_mask(8, 3, num_heads=2, alibi=alibi)
    tmask = torch.from_numpy(np.tile(mask, (3, 1, 1)) if alibi else mask)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x.copy()), torch.from_numpy(x.copy()),
                      torch.from_numpy(x.copy()), need_weights=True,
                      attn_mask=tmask)
    got = mhsa_apply(params, jnp.asarray(x), jnp.asarray(mask), cfg)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("alibi", [False, True])
def test_mhsa_streaming_equals_oneshot(alibi, rng):
    cfg = MHSAConfig(embed_dim=16, num_heads=2, attn_scope=4, alibi=alibi)
    params = init_mhsa_params(jax.random.PRNGKey(1), cfg)
    x = rng.standard_normal((2, 12, 16)).astype(np.float32)
    mask = jnp.asarray(causal_mask(12, 4, num_heads=2, alibi=alibi))
    want = np.asarray(mhsa_apply(params, jnp.asarray(x), mask, cfg))
    state = init_mhsa_state(2, cfg)
    outs = []
    for lo in range(0, 12, 3):
        o, state = mhsa_apply_streaming(
            params, jnp.asarray(x[:, lo:lo + 3]), cfg, state)
        outs.append(np.asarray(o))
    np.testing.assert_allclose(np.concatenate(outs, 1), want,
                               rtol=1e-5, atol=1e-5)


# -------------------------------------------------- T-ConvFFN dispatch


def test_tconvffn_matches_reference_dispatch(ref_mod, rng):
    cfg = SpatialNetConfig(attention="mhsa(64)", **MY_CFG)
    params = init_spatialnet_params(jax.random.PRNGKey(2), cfg)
    layer = ref_mod.SpatialNetLayer(
        dim_hidden=16, dim_squeeze=4, num_freqs=8,
        attention="mamba(4,4)").eval()
    layer.tconvffn = _tconv_modulelist(ref_mod)
    sd = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in
          nested_to_flat(params["layers"]["0"]["tconvffn"]).items()}
    layer.tconvffn.load_state_dict(sd, strict=True)
    x = rng.standard_normal((2, 3, 10, 16)).astype(np.float32)  # B,F,T,H
    with torch.no_grad():
        want = layer._tconvffn(torch.from_numpy(x.copy())).numpy()
    from fnssl_tpu.models.attention import tconvffn_apply
    got = tconvffn_apply(params["layers"]["0"]["tconvffn"],
                         jnp.asarray(x.reshape(6, 10, 16)), cfg.tconv_cfg)
    np.testing.assert_allclose(np.asarray(got).reshape(2, 3, 10, 16), want,
                               rtol=1e-4, atol=1e-5)


# ------------------------------------------------- full-model parity


def test_full_model_mhsa_parity(ref_mod, rng):
    """Patched reference (MHSA + T-ConvFFN) vs our mhsa mode.

    attn_scope >= T and rope=False so both sides run pure causal
    attention (the only behaviour the reference's fast-path call can
    produce — see module docstring)."""
    cfg = SpatialNetConfig(attention="mhsa(64)", rope=False, **MY_CFG)
    params = init_spatialnet_params(jax.random.PRNGKey(3), cfg)
    model = _ref_model(ref_mod)
    for layer in model.layers:
        layer.mhsa = nn.MultiheadAttention(16, 2, batch_first=True)
        layer.tconvffn = _tconv_modulelist(ref_mod)
        layer.norm_tconvffn = nn.Identity()
    model.attn_scope = 64
    model.rope = False
    model.eval()
    _load_my_params_into_ref(model, params)
    x = rng.standard_normal((2, 4, 16, 12)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x.copy())).numpy()
    got = np.asarray(spatialnet_apply(params, jnp.asarray(x), cfg=cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_full_model_retention_parity(ref_mod, rng):
    """Patched reference (MultiScaleRetention, chunkwise) vs ret mode."""
    cfg = SpatialNetConfig(attention="ret(2)", rope=False,
                           chunkwise_recurrent=True, recurrent_chunk_size=4,
                           **MY_CFG)
    params = init_spatialnet_params(jax.random.PRNGKey(4), cfg)
    model = _ref_model(ref_mod)
    for layer in model.layers:
        layer.mhsa = ref_mod.MultiScaleRetention(16, 2, value_factor=2)
        layer.tconvffn = _tconv_modulelist(ref_mod)
        layer.norm_tconvffn = nn.Identity()
    model.eval()
    _load_my_params_into_ref(model, params)
    model.pos = ref_mod.RetNetRelPos(16, 2, recurrent_chunk_size=4)
    model.rope = False
    x = rng.standard_normal((2, 4, 16, 12)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x.copy())).numpy()
    got = np.asarray(spatialnet_apply(params, jnp.asarray(x), cfg=cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_full_model_retention_parallel_mode(ref_mod, rng):
    """chunkwise_recurrent=False plumb-through (IPDnet2.py:337-344)."""
    cfg = SpatialNetConfig(attention="ret(2)", rope=True,
                           chunkwise_recurrent=False, **MY_CFG)
    params = init_spatialnet_params(jax.random.PRNGKey(5), cfg)
    model = _ref_model(ref_mod)
    for layer in model.layers:
        layer.mhsa = ref_mod.MultiScaleRetention(16, 2, value_factor=2)
        layer.tconvffn = _tconv_modulelist(ref_mod)
        layer.norm_tconvffn = nn.Identity()
    model.eval()
    _load_my_params_into_ref(model, params)
    model.pos = ref_mod.RetNetRelPos(16, 2, recurrent_chunk_size=4)
    model.rope = True
    model.chunkwise_recurrent = False
    x = rng.standard_normal((1, 4, 16, 10)).astype(np.float32)
    with torch.no_grad():
        # inference=True makes forward use self.chunkwise_recurrent, but
        # also switches to the per-step loop; instead call with the
        # parallel-mode mask directly through the layer stack as the
        # one-shot equivalent: forward(inference=False) always passes
        # chunkwise_recurrent=True (IPDnet2.py:338), so parallel mode is
        # exercised via the retention module itself.
        rel = model.pos(10, chunkwise_recurrent=False)
        xt = torch.from_numpy(
            rng.standard_normal((2, 10, 16)).astype(np.float32))
        want = model.layers[0].mhsa(xt, rel_pos=rel,
                                    chunkwise_recurrent=False,
                                    rope=True).numpy()
    from fnssl_tpu.models.retention import retention_parallel
    from fnssl_tpu.models.spatialnet import get_causal_mask as gcm
    mine_rel = gcm(cfg, 10)
    got = retention_parallel(params["layers"]["0"]["mhsa"],
                             jnp.asarray(xt.numpy()), mine_rel,
                             cfg.ret_cfg, rope=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------- streaming equivalence


@pytest.mark.parametrize("attention,rope,tol", [
    # mhsa streaming is exactly the one-shot computation (K/V window)
    ("mhsa(6)", "ALiBi", 2e-4), ("mhsa(6)", False, 2e-4),
    # retention recurrent vs chunkwise differ by the cross-chunk
    # rescaling approximation (retention.py:194-253; same as the torch
    # reference's own three-mode tolerance)
    ("ret(2)", False, 2e-2), ("ret(2)", True, 2e-2)])
def test_streaming_equals_oneshot(attention, rope, tol):
    cfg = SpatialNetConfig(attention=attention, rope=rope,
                           recurrent_chunk_size=4, **{
                               **MY_CFG, "time_compression_ratio": 5})
    params = init_spatialnet_params(jax.random.PRNGKey(6), cfg)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 4, 16, 20)).astype(np.float32)
    want = np.asarray(spatialnet_apply(params, jnp.asarray(x), cfg=cfg))
    state = init_spatialnet_state(2, cfg)
    outs = []
    for lo in range(0, 20, 5):
        o, state = spatialnet_apply(params, jnp.asarray(x[:, :, :, lo:lo + 5]),
                                    cfg=cfg, state=state, return_state=True)
        outs.append(np.asarray(o))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)
