"""L0 parity tests vs torch (the reference's numerical substrate)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from fnssl_tpu.core import (
    stft, istft, forgetting_norm, forgetting_norm_streaming, init_state,
    pair_rebatch, pair_unbatch, cart2sph, sph2cart, gcc,
    complex_multiplication, complex_conjugate_multiplication)
from fnssl_tpu.core.pairs import pair_indices


def torch_stft_ref(sig, win_len=512, ratio=0.5, nfft=512, center=False):
    """Reference STFT convention (FN-SSL/Module.py:28-68) built directly on
    torch.stft — the oracle, not a copy of the reference wrapper."""
    nb, ns, nch = sig.shape
    hop = int(win_len * ratio)
    window = torch.hann_window(win_len)
    outs = []
    for c in range(nch):
        s = torch.stft(torch.from_numpy(sig[:, :, c]), n_fft=nfft,
                       hop_length=hop, win_length=win_len, window=window,
                       center=center, normalized=False, return_complex=True)
        outs.append(s)
    return torch.stack(outs, dim=-1).numpy()  # (nb, nf, nt, nch)


@pytest.mark.parametrize("center", [False, True])
def test_stft_matches_torch(rng, center):
    sig = rng.standard_normal((2, 16000, 3)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(sig), center=center))
    ref = torch_stft_ref(sig, center=center)
    if center:
        # torch yields floor(ns/hop)+1 frames; we match that count
        assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref[:, :, :ours.shape[2]], atol=2e-3,
                               rtol=1e-4)


def test_stft_frame_count():
    # FN-SSL: 4.79 s @ 16 kHz, win 512 hop 256 → 298 frames
    sig = jnp.zeros((1, 76672, 2))
    assert stft(sig).shape == (1, 257, 298, 2)


def test_istft_roundtrip(rng):
    sig = rng.standard_normal((1, 8192, 2)).astype(np.float32)
    spec = stft(jnp.asarray(sig), center=True)
    rec = np.asarray(istft(spec))
    n = rec.shape[1]
    np.testing.assert_allclose(rec[0, 256:n - 256], sig[0, 256:n - 256],
                               atol=1e-3)


def torch_forgetting_norm(x, sample_length=298):
    """Oracle re-derivation of FN-SSL/utils.py:9-55 (python loop, torch)."""
    x = torch.from_numpy(x)
    b, c, f, t = x.shape
    x = x.reshape(b, c * f, t)
    alpha = (sample_length - 1) / (sample_length + 1)
    mu = torch.zeros(b, 1)
    mus = []
    for i in range(t):
        alp = min((i - 1) / (i + 1), alpha)
        mu = alp * mu + (1 - alp) * x[:, :, i].mean(dim=1, keepdim=True)
        mus.append(mu)
    return torch.stack(mus, dim=-1).reshape(b, 1, 1, t).numpy()


def test_forgetting_norm_matches_reference_loop(rng):
    mag = np.abs(rng.standard_normal((3, 2, 257, 310))).astype(np.float32)
    ours = np.asarray(forgetting_norm(jnp.asarray(mag), 298))
    ref = torch_forgetting_norm(mag, 298)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_forgetting_norm_streaming_equals_batch(rng):
    """Chunked streaming statistics must equal the one-shot batch result."""
    mag = np.abs(rng.standard_normal((2, 4, 257, 100))).astype(np.float32)
    full = np.asarray(forgetting_norm(jnp.asarray(mag), 298))
    state = init_state(2)
    chunks = []
    for lo in range(0, 100, 30):
        out, state = forgetting_norm_streaming(
            jnp.asarray(mag[..., lo:lo + 30]), state, sample_length=298)
        chunks.append(np.asarray(out))
    np.testing.assert_allclose(np.concatenate(chunks, -1), full, atol=1e-6)


@pytest.mark.parametrize("ch_mode,nch", [("M", 4), ("MM", 4), ("MM", 2)])
def test_pair_rebatch_reference_order(rng, ch_mode, nch):
    data = (rng.standard_normal((3, nch, 5, 7))
            + 1j * rng.standard_normal((3, nch, 5, 7))).astype(np.complex64)
    out = np.asarray(pair_rebatch(jnp.asarray(data), ch_mode))
    first, second = pair_indices(nch, ch_mode)
    p = len(first)
    assert out.shape == (3 * p, 2, 5, 7)
    for b in range(3):
        for k in range(p):
            np.testing.assert_array_equal(out[b * p + k, 0],
                                          data[b, first[k]])
            np.testing.assert_array_equal(out[b * p + k, 1],
                                          data[b, second[k]])
    back = np.asarray(pair_unbatch(jnp.asarray(out), 3))
    assert back.shape == (3, p, 2, 5, 7)
    np.testing.assert_array_equal(back[1, 0], out[p, ...])


def test_mm_pair_order_matches_reference_formula():
    """'MM' slot formula from FN-SSL/Module.py:398-402 → upper-tri order."""
    first, second = pair_indices(4, "MM")
    assert list(zip(first.tolist(), second.tolist())) == [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def test_coords_roundtrip(rng):
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    sph = cart2sph(jnp.asarray(pts), include_r=True)
    rec = np.asarray(sph2cart(sph))
    np.testing.assert_allclose(rec, pts, atol=1e-5)


def test_complex_ops(rng):
    x = rng.standard_normal((4, 5, 2)).astype(np.float32)
    y = rng.standard_normal((4, 5, 2)).astype(np.float32)
    xc = x[..., 0] + 1j * x[..., 1]
    yc = y[..., 0] + 1j * y[..., 1]
    m = np.asarray(complex_multiplication(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(m[..., 0] + 1j * m[..., 1], xc * yc,
                               atol=1e-5)
    cm = np.asarray(complex_conjugate_multiplication(
        jnp.asarray(x), jnp.asarray(y)))
    # NB the reference formula (FN-SSL/Module.py:16-17) is x * conj(y),
    # despite its name suggesting conj(x) * y.
    np.testing.assert_allclose(cm[..., 0] + 1j * cm[..., 1],
                               xc * np.conj(yc), atol=1e-5)


def test_gcc_peak_at_known_lag(rng):
    """A delayed copy must peak at the right lag, PHAT or not."""
    n = 256
    base = rng.standard_normal(n).astype(np.float32)
    lag = 5
    sig = np.stack([base, np.roll(base, lag)])  # x1(t) = x0(t - lag)
    out = np.asarray(gcc(jnp.asarray(sig[None]), tau_max=20, phat=True))
    assert out.shape == (1, 2, 2, 41)
    # Reference convention: entry (1,0) = X1*conj(X0) peaks at +lag
    # (index `lag` in the [0..tau_max, -tau_max..-1] layout).
    assert int(np.argmax(out[0, 1, 0])) == lag
