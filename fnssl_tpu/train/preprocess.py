"""On-line training-step preprocessing (STFT front-end + DP-IPD targets).

A distinctive property of the reference preserved here: the STFT and the
ground-truth DP-IPD generation happen *inside* the training step, not in the
dataset (FN-SSL/Lightning/main.py:200-267 ``data_preprocess``). Unlike the
reference — which bounces the targets to CPU numpy every step
(main.py:234-238) — everything here is one jit-able function, so the whole
step fuses into a single XLA program on the TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fnssl_tpu.core.norm import forgetting_norm, offline_norm
from fnssl_tpu.core.pairs import pair_rebatch
from fnssl_tpu.core.stft import stft
from fnssl_tpu.physics.targets import vad_mask_and_sum, vad_gate_with_nonsource


@functools.partial(
    jax.jit, static_argnames=("ch_mode", "win_len", "win_shift_ratio",
                              "nfft", "center", "norm", "sample_length"))
def stft_features(mic_sig: jax.Array, *, ch_mode: str = "MM",
                  win_len: int = 512, win_shift_ratio: float = 0.5,
                  nfft: int = 512, center: bool = False,
                  norm: str = "online", sample_length: int = 298,
                  eps: float = 1e-6) -> jax.Array:
    """Mic signals → normalized real/imag pair features.

    Args:
      mic_sig: (nb, nsample, nch) time signals.
      norm: 'online' (forgetting_norm, causal), 'offline' (global mean),
        or 'none'.

    Returns:
      (nb*P, 4, nf//2, nt) float32 — the model input layout
      (reference: main.py:204-225; fre_range_used = bins 1..nfft/2).
    """
    spec = stft(mic_sig, win_len=win_len, win_shift_ratio=win_shift_ratio,
                nfft=nfft, center=center)          # (nb, nf, nt, nch)
    spec = jnp.transpose(spec, (0, 3, 1, 2))       # (nb, nch, nf, nt)
    if ch_mode == "none":
        pairs = spec  # IPDnet keeps all channels (runIPDnetOn.py:245-253)
    else:
        pairs = pair_rebatch(spec, ch_mode=ch_mode)  # (nb*P, 2, nf, nt)
    if norm == "online":
        mean = forgetting_norm(jnp.abs(pairs), sample_length=sample_length)
        denom = mean + eps
    elif norm == "offline":
        denom = offline_norm(jnp.abs(pairs)) + eps
    else:
        denom = jnp.ones((), pairs.real.dtype)
    feats = jnp.concatenate(
        [jnp.real(pairs) / denom, jnp.imag(pairs) / denom], axis=1)
    return feats[:, :, 1: nfft // 2 + 1, :]


def make_fnssl_preprocess(dpipd, *, ch_mode: str = "MM",
                          win_len: int = 512, win_shift_ratio: float = 0.5,
                          nfft: int = 512, sample_length: int = 298):
    """Build the FN-SSL (features, targets) preprocessing closure.

    ``dpipd`` is a physics.DPIPD instance (its baseline/freq tables close
    over the jitted function as constants).

    Returns fn(mic_sig, doa, vad) → (features, {'ipd', 'doa', 'vad_sources'})
      mic_sig: (nb, nsample, nch); doa: (nb, nt2, 2, ns) radians;
      vad: (nb, nt2, ns) soft VAD at the segment rate.
    """
    fre_used = slice(1, nfft // 2 + 1)

    @jax.jit
    def preprocess(mic_sig, doa, vad):
        feats = stft_features(
            mic_sig, ch_mode=ch_mode, win_len=win_len,
            win_shift_ratio=win_shift_ratio, nfft=nfft,
            sample_length=sample_length)
        ipd = dpipd.targets(doa)                   # (nb, nt2, nf, P, ns)
        ipd = jnp.concatenate(
            [jnp.real(ipd[:, :, fre_used]), jnp.imag(ipd[:, :, fre_used])],
            axis=2).astype(jnp.float32)            # (nb, nt2, 2nf, P, ns)
        gt_ipd = vad_mask_and_sum(ipd, vad)        # (nb, nt2, 2nf, P)
        return feats, {"ipd": gt_ipd, "doa": doa, "vad_sources": vad}

    return preprocess


def make_ipdnet_preprocess(dpipd, nonsource, *, ch_mode: str = "none",
                           win_len: int = 512, win_shift_ratio: float = 0.5,
                           nfft: int = 512, sample_length: int = 280,
                           vad_threshold: float = 0.001):
    """IPDnet multi-track preprocessing: per-track targets with the Bessel
    non-source fill on silent frames (runIPDnetOn.py:236-301 vectorized).

    ``nonsource`` is the (2nf, P) Bessel target
    (physics.bessel_nonsource_target).

    Returns fn(mic_sig, doa, vad) → (features, {'ipd', ...}) where 'ipd' is
    (nb, nt2, 2nf, P, ns) per-track targets for the PIT loss.
    """
    fre_used = slice(1, nfft // 2 + 1)
    nonsource = np.asarray(nonsource, np.float32)  # host constant

    @jax.jit
    def preprocess(mic_sig, doa, vad):
        feats = stft_features(
            mic_sig, ch_mode=ch_mode, win_len=win_len,
            win_shift_ratio=win_shift_ratio, nfft=nfft,
            sample_length=sample_length)
        ipd = dpipd.targets(doa)
        ipd = jnp.concatenate(
            [jnp.real(ipd[:, :, fre_used]), jnp.imag(ipd[:, :, fre_used])],
            axis=2).astype(jnp.float32)
        gt_ipd = vad_gate_with_nonsource(ipd, vad, nonsource,
                                         threshold=vad_threshold)
        return feats, {"ipd": gt_ipd, "doa": doa, "vad_sources": vad}

    return preprocess
