"""Batched multichannel STFT / ISTFT for TPU.

Semantics match the reference front-ends exactly (fp32):
  * FN-SSL / IPDnet variant: ``center=False``,
    ``nt = floor((nsample - win_len)/hop) + 1``
    (reference: FN-SSL/Module.py:28-68).
  * IPDnet2 variant: ``center=True`` (reflect pad), ``nt = floor(nsample/hop)+1``
    (reference: IPDnet2/Module.py:26-64).

TPU-first design notes: framing is a static gather (all shapes static under
jit), the window multiply fuses into the rfft's input, and the whole
(batch, channel, frame) volume goes through one batched ``jnp.fft.rfft`` —
no per-channel Python loop like the reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_len: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (same as torch.hann_window(periodic=True))."""
    n = np.arange(win_len)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_len)
    return jnp.asarray(w, dtype=dtype)


def _get_window(win: str, win_len: int, dtype=jnp.float32) -> jax.Array:
    if win == "hann":
        return hann_window(win_len, dtype)
    if win == "boxcar":
        return jnp.ones((win_len,), dtype)
    raise ValueError(f"unknown window {win!r}")


def num_frames(nsample: int, win_len: int, win_shift_ratio: float,
               center: bool = False) -> int:
    """Frame count for the given STFT convention (static python int)."""
    hop = int(win_len * win_shift_ratio)
    if center:
        return int(np.floor(nsample / hop)) + 1
    return int(np.floor((nsample - win_len) / hop + 1))


@functools.partial(
    jax.jit, static_argnames=("win_len", "win_shift_ratio", "nfft", "win",
                              "center"))
def stft(signal: jax.Array, *, win_len: int = 512,
         win_shift_ratio: float = 0.5, nfft: int = 512, win: str = "hann",
         center: bool = False) -> jax.Array:
    """STFT of multichannel signals.

    Args:
      signal: (nb, nsample, nch) float.
      center: False → FN-SSL convention; True → IPDnet2 convention
        (reflect-pad nfft//2 on both sides, like torch.stft(center=True)).

    Returns:
      (nb, nf, nt, nch) complex64 with nf = nfft//2 + 1.
    """
    nb, nsample, nch = signal.shape
    hop = int(win_len * win_shift_ratio)
    x = jnp.transpose(signal, (0, 2, 1)).astype(jnp.float32)  # (nb, nch, ns)

    if center:
        pad = nfft // 2
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="reflect")
        nt = int(np.floor(nsample / hop)) + 1
    else:
        nt = int(np.floor((nsample - win_len) / hop + 1))

    # Static-gather framing: (nt, win_len) index matrix.
    idx = (np.arange(nt)[:, None] * hop + np.arange(win_len)[None, :])
    frames = x[:, :, idx]  # (nb, nch, nt, win_len)

    window = _get_window(win, win_len)
    frames = frames * window  # broadcast over last axis

    if nfft > win_len:  # torch zero-pads the window centre-aligned
        lpad = (nfft - win_len) // 2
        frames = jnp.pad(frames,
                         ((0, 0), (0, 0), (0, 0), (lpad, nfft - win_len - lpad)))

    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)  # (nb, nch, nt, nf)
    spec = spec.astype(jnp.complex64)
    return jnp.transpose(spec, (0, 3, 2, 1))  # (nb, nf, nt, nch)


@functools.partial(
    jax.jit, static_argnames=("win_len", "win_shift_ratio", "nfft"))
def istft(spec: jax.Array, *, win_len: int = 512,
          win_shift_ratio: float = 0.5, nfft: int = 512) -> jax.Array:
    """Inverse STFT with overlap-add, matching torch.istft(center=True).

    Args:
      spec: (nb, nf, nt, nch) complex.

    Returns:
      (nb, nsample, nch) float32 with nsample = (nt-1)*hop, matching the
      reference ISTFT's crop (FN-SSL/Module.py:70-99).
    """
    nb, nf, nt, nch = spec.shape
    hop = int(win_len * win_shift_ratio)
    nsample = (nt - 1) * hop

    x = jnp.transpose(spec, (0, 3, 2, 1))  # (nb, nch, nt, nf)
    frames = jnp.fft.irfft(x, n=nfft, axis=-1)[..., :win_len]
    window = hann_window(win_len)
    frames = frames * window

    # Overlap-add via scatter-add over static indices.
    idx = (np.arange(nt)[:, None] * hop + np.arange(win_len)[None, :]).ravel()
    total = (nt - 1) * hop + win_len
    flat = frames.reshape(nb, nch, -1)
    sig = jnp.zeros((nb, nch, total), jnp.float32).at[:, :, idx].add(flat)

    # Window-envelope normalization (matches torch.istft).
    wsq = (window ** 2)
    env = jnp.zeros((total,), jnp.float32).at[idx].add(
        jnp.tile(wsq, nt))
    sig = sig / jnp.maximum(env, 1e-11)

    # center=True crop: drop nfft//2 leading samples, keep nsample.
    pad = nfft // 2
    sig = sig[:, :, pad:pad + nsample]
    return jnp.transpose(sig, (0, 2, 1))
