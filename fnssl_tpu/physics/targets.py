"""Training-target assembly: VAD gating, non-source targets, DP-VAD.

Vectorized replacements for the reference's python-loop target plumbing:
  * FN-SSL single-source masking (Lightning/main.py:249-259)
  * IPDnet Bessel non-source fill — the nb×nt×ns python triple loop at
    runIPDnetOn.py:279-283 becomes one jnp.where
  * DP-signal VAD (runIPDnetOn.py:224-235)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import jn


def ipd_complex_to_ri(ipd: jax.Array, fre_used) -> jax.Array:
    """(nb, nt, nf, P, ns) complex → (nb, nt, 2nf_used, P, ns) real.

    Concatenates real then imag along the frequency axis after slicing the
    used bins (reference: Lightning/main.py:237-238).
    """
    sel = ipd[:, :, fre_used]
    return jnp.concatenate([jnp.real(sel), jnp.imag(sel)], axis=2
                           ).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("threshold",))
def vad_mask_and_sum(ipd_ri: jax.Array, vad: jax.Array,
                     threshold: float = 0.0) -> jax.Array:
    """FN-SSL target: binarize VAD, gate per-source IPD, sum over sources.

    Args:
      ipd_ri: (nb, nt, 2nf, P, ns) real/imag targets.
      vad: (nb, nt, ns) soft VAD.
    Returns:
      (nb, nt, 2nf, P).
    """
    gate = (vad > threshold).astype(ipd_ri.dtype)
    return jnp.sum(ipd_ri * gate[:, :, None, None, :], axis=-1)


def bessel_nonsource_target(mic_pos: np.ndarray, fre_used,
                            nf: int = 257, fre_max: float = 8000.0,
                            speed: float = 340.0, order: int = 0,
                            ch_mode: str = "M") -> np.ndarray:
    """Silent-frame target: spherical diffuse coherence J0(2πf·d/c).

    Parity: IPDnet/runIPDnetOn.py:209-221 (including its speed=340 and the
    zero imaginary half). Pair distances follow ``ch_mode`` ('M': from
    mic 0; 'MM': all pairs).

    Returns:
      (2·nf_used, P) float32.
    """
    from fnssl_tpu.core.pairs import pair_indices

    mic_pos = np.asarray(mic_pos, np.float64)
    first, second = pair_indices(mic_pos.shape[0], ch_mode)
    dist = np.linalg.norm(mic_pos[second] - mic_pos[first], axis=1)
    omega = 2.0 * np.pi * np.linspace(0.0, fre_max, nf) / speed
    omega = omega[fre_used]
    rows = []
    for d in dist:
        bes = jn(order, omega * d)
        rows.append(np.concatenate([bes, np.zeros_like(bes)]))
    return np.stack(rows, axis=0).T.astype(np.float32)  # (2nf_used, P)


@functools.partial(jax.jit, static_argnames=("threshold",))
def vad_gate_with_nonsource(ipd_ri: jax.Array, vad: jax.Array,
                            nonsource: jax.Array,
                            threshold: float = 0.001) -> jax.Array:
    """IPDnet multi-track target: gate by VAD, fill silent frames with the
    Bessel non-source target (vectorized version of the reference's
    nb×nt×ns loop at runIPDnetOn.py:279-283).

    Args:
      ipd_ri: (nb, nt, 2nf, P, ns); vad: (nb, nt, ns);
      nonsource: (2nf, P).
    Returns:
      (nb, nt, 2nf, P, ns).
    """
    active = (vad > threshold)[:, :, None, None, :]
    return jnp.where(active, ipd_ri, nonsource[None, None, :, :, None])


@functools.partial(jax.jit, static_argnames=("pool",))
def dp_vad(dp_stft: jax.Array, mix_stft: jax.Array,
           pool: int = 12) -> jax.Array:
    """Frame VAD from direct-path / mixture magnitude ratio at mic 0.

    Args:
      dp_stft: (nb, nf, nt, nch, ns) direct-path STFT per source.
      mix_stft: (nb, nf, nt, nch) mixture STFT.
    Returns:
      (nb, nt//pool, ns) soft VAD (12× average pooled like the reference).
    """
    ratio = jnp.abs(dp_stft[:, :, :, 0]) / jnp.abs(mix_stft[:, :, :, 0:1])
    vad = jnp.mean(ratio, axis=1)  # (nb, nt, ns)
    nb, nt, ns = vad.shape
    t2 = nt // pool
    return vad[:, : t2 * pool].reshape(nb, t2, pool, ns).mean(axis=2)


def energy_vad(signal: np.ndarray, fs: int = 16000, win_s: float = 0.1,
               threshold: float = -2.5) -> np.ndarray:
    """Log-FFT-energy VAD over 0.1 s windows (RealMAN recordings).

    Parity: IPDnet2/RecordData.py:41-55. Host-side numpy (data pipeline).
    """
    win = int(fs * win_s)
    nwin = len(signal) // win
    x = signal[: nwin * win].reshape(nwin, win)
    spec = np.fft.fft(x, axis=1)[:, : win // 2]  # reference keeps fft half
    energy = np.log10(np.sum(np.abs(spec) ** 2, axis=1) + 1e-10)
    return (energy >= threshold).astype(np.float32)
