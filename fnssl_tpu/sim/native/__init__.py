"""ctypes loader for the C++/OpenMP image-source engine.

Auto-builds ``libism.so`` with make on first use when a compiler is
available; ``native_available()`` gates callers, which fall back to the
vectorized numpy engine (fnssl_tpu/sim/ism.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libism.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=300)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.simulate_rir_native.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C"),   # room
        np.ctypeslib.ndpointer(np.float64, flags="C"),   # beta
        np.ctypeslib.ndpointer(np.float64, flags="C"),   # src
        np.ctypeslib.ndpointer(np.float64, flags="C"),   # mic
        np.ctypeslib.ndpointer(np.int32, flags="C"),     # nb_img
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # npts nch nsamp
        ctypes.c_double, ctypes.c_double,                # fs c
        np.ctypeslib.ndpointer(np.float32, flags="C"),   # out
    ]
    lib.simulate_rir_native.restype = None
    lib.ism_num_threads.restype = ctypes.c_int32
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def num_threads() -> int:
    lib = _load()
    return int(lib.ism_num_threads()) if lib else 0


def simulate_rir_native(room_sz, beta, src_pos, mic_pos, nb_img,
                        tmax: float, fs: float,
                        c: float = 343.0) -> np.ndarray:
    """C++/OpenMP drop-in for sim.ism.simulate_rir (same signature)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ISM library unavailable")
    room = np.ascontiguousarray(room_sz, np.float64)
    beta = np.ascontiguousarray(beta, np.float64)
    src = np.ascontiguousarray(np.atleast_2d(src_pos), np.float64)
    mic = np.ascontiguousarray(np.atleast_2d(mic_pos), np.float64)
    orders = np.ascontiguousarray(
        np.maximum(np.asarray(nb_img, np.int32), 0))
    npts, nch = src.shape[0], mic.shape[0]
    nsamp = int(np.ceil(tmax * fs))
    out = np.zeros((npts, nch, nsamp), np.float32)
    lib.simulate_rir_native(room, beta, src, mic, orders,
                            npts, nch, nsamp, float(fs), float(c), out)
    return out


_vad_lib = None
_vad_tried = False
_VAD_PATH = os.path.join(_DIR, "libvad.so")


def _load_vad():
    global _vad_lib, _vad_tried
    if _vad_lib is not None or _vad_tried:
        return _vad_lib
    _vad_tried = True
    if not os.path.exists(_VAD_PATH):
        try:
            subprocess.run(["make", "-C", _DIR, "libvad.so"], check=True,
                           capture_output=True, timeout=300)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_VAD_PATH)
    except OSError:
        return None
    lib.frame_vad_native.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C"),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_double,
        np.ctypeslib.ndpointer(np.float32, flags="C"),
    ]
    lib.frame_vad_native.restype = None
    _vad_lib = lib
    return _vad_lib


def vad_available() -> bool:
    return _load_vad() is not None


_gmm_lib = None
_gmm_tried = False
_GMM_PATH = os.path.join(_DIR, "libgmmvad.so")


def _load_gmm():
    global _gmm_lib, _gmm_tried
    if _gmm_lib is not None or _gmm_tried:
        return _gmm_lib
    _gmm_tried = True
    if not os.path.exists(_GMM_PATH):
        try:
            subprocess.run(["make", "-C", _DIR, "libgmmvad.so"],
                           check=True, capture_output=True, timeout=300)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_GMM_PATH)
    except OSError:
        return None
    lib.gmm_vad_native.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C"),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.float32, flags="C"),
    ]
    lib.gmm_vad_native.restype = ctypes.c_int64
    _gmm_lib = lib
    return _gmm_lib


def gmm_vad_available() -> bool:
    return _load_gmm() is not None


def gmm_vad_native(signal, fs: int, mode: int = 3) -> np.ndarray:
    """webrtcvad-class GMM VAD (C++, sim/native/gmm_vad.cpp).

    Per-sample 0/1 mask. mode 0..3 = webrtcvad set_mode aggressiveness.
    """
    lib = _load_gmm()
    if lib is None:
        raise RuntimeError("native GMM VAD library unavailable")
    sig = np.ascontiguousarray(signal, np.float32)
    out = np.zeros(len(sig), np.float32)
    rc = lib.gmm_vad_native(sig, len(sig), int(fs), int(mode), out)
    if rc < 0:
        raise ValueError(f"gmm_vad_native: bad fs={fs} or mode={mode}")
    return out


def frame_vad_native(signal, frame_len: int, margin_db: float):
    """C++ drop-in for the energy-ladder frame VAD core."""
    lib = _load_vad()
    if lib is None:
        raise RuntimeError("native VAD library unavailable")
    sig = np.ascontiguousarray(signal, np.float32)
    out = np.zeros(len(sig), np.float32)
    lib.frame_vad_native(sig, len(sig), frame_len, float(margin_db), out)
    return out
