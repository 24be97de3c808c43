"""Streaming runtime ≡ one-shot pipeline (bit-equality) under arbitrary
push sizes — the end-to-end causal capability (SURVEY.md §5.7)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fnssl_tpu.models.fnssl import (
    FNSSLConfig, fnssl_apply, init_fnssl_params)
from fnssl_tpu.models.ipdnet import (
    IPDnetConfig, init_ipdnet_params, ipdnet_apply)
from fnssl_tpu.runtime.streaming import (
    StreamingLocalizer, make_fnssl_stream_step, make_ipdnet_stream_step)
from fnssl_tpu.train.preprocess import stft_features


@pytest.mark.parametrize("push_sizes", [
    [3072] * 4,                      # aligned pushes
    [1000, 500, 4096, 2000, 4692],   # ragged pushes
])
def test_streaming_fnssl_equals_oneshot(rng, push_sizes):
    cfg = FNSSLConfig()
    params = init_fnssl_params(jax.random.PRNGKey(0), cfg)
    sig = rng.standard_normal((sum(push_sizes), 2)).astype(np.float32)

    feats = stft_features(jnp.asarray(sig[None]), ch_mode="MM")
    oneshot = np.asarray(fnssl_apply(params, feats, cfg=cfg))

    sl = StreamingLocalizer(make_fnssl_stream_step(params, cfg), nch=2,
                            ch_mode="MM")
    outs = []
    pos = 0
    for n in push_sizes:
        outs += sl.push(sig[pos: pos + n])
        pos += n
    streamed = np.concatenate([np.asarray(o) for o in outs], axis=1)
    nt2 = streamed.shape[1]
    np.testing.assert_allclose(streamed, oneshot[:, :nt2], rtol=1e-5,
                               atol=1e-6)
    assert nt2 == oneshot.shape[1]  # no frames lost
    assert sl.rtf > 0


def test_streaming_ipdnet_equals_oneshot(rng):
    cfg = IPDnetConfig()
    params = init_ipdnet_params(jax.random.PRNGKey(1), cfg)
    nsample = 3072 * 3 + 256
    sig = rng.standard_normal((nsample, 2)).astype(np.float32)

    feats = stft_features(jnp.asarray(sig[None]), ch_mode="none",
                          sample_length=280)
    oneshot = np.asarray(ipdnet_apply(params, feats, cfg=cfg))

    sl = StreamingLocalizer(make_ipdnet_stream_step(params, cfg), nch=2,
                            ch_mode="none", sample_length=280)
    outs = []
    for start in range(0, nsample, 1111):
        outs += sl.push(sig[start: start + 1111])
    streamed = np.concatenate([np.asarray(o) for o in outs], axis=1)
    nt2 = streamed.shape[1]
    np.testing.assert_allclose(streamed, oneshot[:, :nt2], rtol=1e-5,
                               atol=1e-6)


def test_streaming_ipdnet2_center_true_equals_oneshot(rng):
    """The IPDnet2 front-end (torch.stft center=True, hop 0.625·512,
    forgetting-norm L=249, all channels) streams bit-equal to one-shot:
    the start reflect-pad becomes a one-time prefix built from the first
    nfft//2+1 samples. One-shot's *end* reflect-pad frames have no live
    equivalent, so parity covers every streamed frame (all but the last
    <=1 of the one-shot grid)."""
    from fnssl_tpu.models.spatialnet import (
        SpatialNetConfig, init_spatialnet_params, spatialnet_apply)
    from fnssl_tpu.runtime.streaming import make_spatialnet_stream_step

    cfg = SpatialNetConfig(num_layers=1)
    nch = cfg.dim_input // 2
    params = init_spatialnet_params(jax.random.PRNGKey(2), cfg)
    nsample = 16000
    sig = rng.standard_normal((nsample, nch)).astype(np.float32)

    feats = stft_features(jnp.asarray(sig[None]), ch_mode="none",
                          win_shift_ratio=0.625, center=True,
                          sample_length=249)
    oneshot = np.asarray(spatialnet_apply(params, feats, cfg=cfg))

    sl = StreamingLocalizer(make_spatialnet_stream_step(params, cfg),
                            nch=nch, ch_mode="none", hop=320,
                            center=True, sample_length=249,
                            frames_per_step=5)
    outs = []
    for start in range(0, nsample, 1600):       # 100 ms pushes
        outs += sl.push(sig[start: start + 1600])
    streamed = np.concatenate([np.asarray(o) for o in outs], axis=1)
    nt2 = streamed.shape[1]
    assert nt2 >= oneshot.shape[1] - 1          # only end-pad frames miss
    np.testing.assert_allclose(streamed, oneshot[:, :nt2], rtol=1e-5,
                               atol=1e-6)
