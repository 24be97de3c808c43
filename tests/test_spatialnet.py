"""OnlineSpatialNet (IPDnet2) tests.

Full-model logit parity vs the reference is impossible in-container (its
Mamba blocks require the CUDA-only mamba_ssm package), so coverage is:
sub-module parity for every torch-runnable piece (encoder CausalConv1d,
FreqInverse, fconv/full assemblies), Mamba mode-equivalence (separate
file), full-model shape/causality, and streaming ≡ one-shot.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from fnssl_tpu.models.spatialnet import (
    SpatialNetConfig, _fconv, _full, init_spatialnet_params,
    init_spatialnet_state, spatialnet_apply)
from tests.reference_oracle import load_reference_module

CFG = SpatialNetConfig(dim_input=4, dim_output=8, num_layers=2,
                       dim_squeeze=4, num_freqs=32, dim_hidden=16,
                       conv_groups=8, d_state=4, mamba_conv=4)


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_module(
        "IPDnet2/IPDnet2.py", "ref_ipdnet2",
        extra_sys_path="/root/reference/IPDnet2",
        stub_modules=("soundfile", "webrtcvad", "gpuRIR"))


def test_causal_conv_encoder_matches_reference(ref_mod, rng):
    ref = ref_mod.CausalConv1d(in_channels=4, out_channels=16,
                               kernel_size=5).eval()
    params = init_spatialnet_params(jax.random.PRNGKey(0), CFG)
    ref.load_state_dict({
        "weight": torch.from_numpy(
            np.asarray(params["encoder"]["weight"]).copy()),
        "bias": torch.from_numpy(
            np.asarray(params["encoder"]["bias"]).copy())})
    x = rng.standard_normal((3, 4, 32, 10)).astype(np.float32)  # B,C,F,T
    with torch.no_grad():
        xt = torch.from_numpy(x.copy()).permute(0, 2, 3, 1)  # B,F,T,C
        r = ref(xt.reshape(3 * 32, 10, 4).permute(0, 2, 1)).numpy()
    out = spatialnet_apply(params, jnp.asarray(x), cfg=CFG)
    del out  # full-model runs; encoder checked directly below
    # direct encoder check
    from fnssl_tpu.models.spatialnet import _grouped_conv1d
    y = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)).reshape(96, 10, 4)
    yt = jnp.swapaxes(y, 1, 2)
    yin = jnp.pad(yt, ((0, 0), (0, 0), (4, 0)))
    m = np.asarray(_grouped_conv1d(params["encoder"], yin, 1, (0, 0)))
    np.testing.assert_allclose(m, r, rtol=1e-4, atol=1e-5)


def test_freq_inverse_matches_reference(ref_mod, rng):
    ref = ref_mod.FreqInverse(nfreq=32, compression_ratio=16,
                              hidden_dim=16, out_dim=8).eval()
    params = init_spatialnet_params(jax.random.PRNGKey(1), CFG)
    w = np.asarray(params["freq_inverse"]["trans2"]["weight"])
    b = np.asarray(params["freq_inverse"]["trans2"]["bias"])
    ref.load_state_dict({"trans2.weight": torch.from_numpy(w.copy()),
                         "trans2.bias": torch.from_numpy(b.copy())})
    x = rng.standard_normal((2, 16, 7, 2)).astype(np.float32)  # B,H,T,F16
    with torch.no_grad():
        r = ref(torch.from_numpy(x.copy())).numpy()
    # inline the FreqInverse math from spatialnet_apply
    cr, out_dim = 16, 8
    wj = jnp.asarray(w[:, :, 0])
    z = jnp.einsum("bhtf,oh->botf", jnp.asarray(x), wj) \
        + jnp.asarray(b)[None, :, None, None]
    z = z.reshape(2, out_dim, cr, 7, 2)
    z = jnp.transpose(z, (0, 1, 4, 2, 3)).reshape(2, out_dim, 32, 7)
    m = np.asarray(jnp.tanh(jnp.transpose(z, (0, 1, 3, 2))))
    np.testing.assert_allclose(m, r, rtol=1e-4, atol=1e-5)


def test_fconv_and_full_match_torch(rng):
    """The layer's fconv / full-band assemblies vs hand-built torch."""
    params = init_spatialnet_params(jax.random.PRNGKey(2), CFG)
    p = params["layers"]["0"]
    h, g, kf = CFG.dim_hidden, CFG.conv_groups, CFG.f_kernel_size

    ln = nn.LayerNorm(h)
    conv = nn.Conv1d(h, h, kf, groups=g, padding="same")
    prelu = nn.PReLU(h)
    ln.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                        for k, v in p["fconv1"]["0"].items()})
    conv.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                          for k, v in p["fconv1"]["1"].items()})
    prelu.load_state_dict({"weight": torch.from_numpy(
        np.asarray(p["fconv1"]["2"]["weight"]).copy())})

    x = rng.standard_normal((2, 8, 6, h)).astype(np.float32)  # B,F,T,H
    with torch.no_grad():
        xt = torch.from_numpy(x.copy())
        b_, f_, t_, _ = xt.shape
        y = xt.permute(0, 2, 3, 1).reshape(b_ * t_, h, f_)
        y = ln(y.transpose(-1, 1)).transpose(-1, 1)
        y = prelu(conv(y))
        r = y.reshape(b_, t_, h, f_).permute(0, 3, 1, 2).numpy()
    m = np.asarray(_fconv(p["fconv1"], jnp.asarray(x), CFG))
    np.testing.assert_allclose(m, r, rtol=1e-4, atol=1e-5)

    # full-band module
    ln_f = nn.LayerNorm(h)
    sq = nn.Conv1d(h, CFG.dim_squeeze, 1)
    fullin = nn.Linear(CFG.num_freqs // 2, CFG.num_freqs // 2)
    unsq = nn.Conv1d(CFG.dim_squeeze, h, 1)
    ln_f.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                          for k, v in p["norm_full"].items()})
    sq.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                        for k, v in p["squeeze"]["0"].items()})
    fullin.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                            for k, v in p["full"].items()})
    unsq.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                          for k, v in p["unsqueeze"]["0"].items()})
    x = rng.standard_normal((2, CFG.num_freqs // 2, 6, h)
                            ).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x.copy())
        b_, f_, t_, _ = xt.shape
        y = ln_f(xt)
        y = y.permute(0, 2, 3, 1).reshape(b_ * t_, h, f_)
        y = torch.nn.functional.silu(sq(y))
        y = fullin(y)
        y = torch.nn.functional.silu(unsq(y))
        r = y.reshape(b_, t_, h, f_).permute(0, 3, 1, 2).numpy()
    m = np.asarray(_full(p, jnp.asarray(x), CFG))
    np.testing.assert_allclose(m, r, rtol=1e-4, atol=1e-5)


def test_spatialnet_shapes_and_causality(rng):
    params = init_spatialnet_params(jax.random.PRNGKey(3), CFG)
    x = rng.standard_normal((1, 4, 32, 20)).astype(np.float32)
    out = np.asarray(spatialnet_apply(params, jnp.asarray(x), cfg=CFG))
    # (nb, nt/5, 2nf, dim_output/4, 2)
    assert out.shape == (1, 4, 64, 2, 2)
    assert np.isfinite(out).all()
    # causality at the compressed frame rate: perturb the last 5 input
    # frames → only the last output frame may change
    x2 = x.copy()
    x2[..., 15:] += 10.0
    out2 = np.asarray(spatialnet_apply(params, jnp.asarray(x2), cfg=CFG))
    np.testing.assert_allclose(out2[:, :3], out[:, :3], rtol=1e-4,
                               atol=1e-5)
    assert np.abs(out2[:, 3] - out[:, 3]).max() > 1e-4


def test_spatialnet_streaming_equals_oneshot(rng):
    params = init_spatialnet_params(jax.random.PRNGKey(4), CFG)
    nb, nt = 1, 20
    x = rng.standard_normal((nb, 4, 32, nt)).astype(np.float32)
    full = np.asarray(spatialnet_apply(params, jnp.asarray(x), cfg=CFG))
    state = init_spatialnet_state(nb, CFG)
    outs = []
    for t0 in range(0, nt, 5):
        o, state = spatialnet_apply(params, jnp.asarray(x[..., t0:t0 + 5]),
                                    cfg=CFG, state=state,
                                    return_state=True)
        outs.append(np.asarray(o))
    streamed = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(streamed, full, rtol=1e-4, atol=1e-5)


def test_ipdnet2_task_loss_decreases(rng):
    from fnssl_tpu.train import (
        init_train_state, make_optimizer, make_train_step)
    from fnssl_tpu.train.tasks import make_ipdnet2_task

    cfg = SpatialNetConfig(dim_input=10, dim_output=16, num_layers=2,
                           dim_squeeze=4, num_freqs=256, dim_hidden=16,
                           conv_groups=8, d_state=4)
    task = make_ipdnet2_task(cfg=cfg)
    tx = make_optimizer("adamw", base_lr=5e-4, gamma=0.975,
                        steps_per_epoch=1, grad_clip=5.0)
    params = init_spatialnet_params(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params, tx)
    step = make_train_step(task.loss_fn, tx)
    nb, nt2, ns = 1, 3, 2
    batch = {
        "mic_sig": rng.standard_normal((nb, 4800, 5)).astype(np.float32),
        "azi_deg": rng.uniform(0, 180, (nb, nt2, ns)).astype(np.float32),
        "distance": rng.uniform(0.5, 3.0, (nb, nt2, ns)
                                ).astype(np.float32),
        "vad": np.ones((nb, nt2, ns), np.float32),
        "mic_pos": np.broadcast_to(
            task.dpipd.mic_location.astype(np.float32),
            (nb, 5, 3)).copy(),
    }
    losses = []
    for i in range(3):
        state, loss = step(state, batch, None)
        losses.append(float(loss))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0], losses
