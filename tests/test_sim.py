"""Physics-invariant tests for the image-source RIR engine.

The reference outsources room simulation to gpuRIR (CUDA,
FN-SSL/Dataset.py:141-201); our host engine is validated against
closed-form acoustics instead of a golden binary.
"""
import numpy as np
import pytest
from scipy.signal import fftconvolve

from fnssl_tpu.sim import (
    att2t_sabine_estimator, beta_sabine_estimation, simulate_rir,
    simulate_trajectory, t2n)

FS = 16000.0
C = 343.0


def test_anechoic_rir_peak_delay_and_amplitude():
    # order-0 with beta=0 → only the direct path survives
    src = np.array([[2.0, 3.0, 1.5]])
    mic = np.array([[4.0, 3.0, 1.5], [4.5, 3.0, 1.5]])
    rir = simulate_rir([6, 6, 3], np.zeros(6), src, mic,
                       nb_img=[0, 0, 0], tmax=0.05, fs=FS, c=C)
    assert rir.shape == (1, 2, int(0.05 * FS))
    for m in range(2):
        d = np.linalg.norm(mic[m] - src[0])
        tsamp = d * FS / C
        nz = np.nonzero(rir[0, m])[0]
        # linear fractional-delay interp spreads over [floor, floor+1]
        assert nz.min() == int(np.floor(tsamp))
        assert nz.max() <= int(np.floor(tsamp)) + 1
        assert rir[0, m].sum() == pytest.approx(1 / (4 * np.pi * d),
                                                rel=1e-5)


def test_image_count_and_symmetry():
    # perfectly reflecting walls, order 1: 2*3^3 = 54 images per dim combo
    src = np.array([[1.0, 1.0, 1.0]])
    mic = np.array([[2.0, 1.0, 1.0]])
    rir = simulate_rir([4, 4, 4], np.ones(6), src, mic,
                       nb_img=[1, 1, 1], tmax=0.1, fs=FS, c=C)
    # total energy must exceed the direct path alone (images add power)
    d = 1.0
    direct_e = (1 / (4 * np.pi * d)) ** 2
    assert (rir ** 2).sum() > direct_e * 2


def test_reverberant_decay_tracks_t60():
    room = [5.0, 4.0, 3.0]
    t60 = 0.4
    beta = beta_sabine_estimation(room, t60)
    assert beta.shape == (6,)
    tmax = att2t_sabine_estimator(40.0, t60)
    nb_img = t2n(tmax, room, c=C)
    src = np.array([[1.2, 1.9, 1.4]])
    mic = np.array([[3.7, 2.1, 1.6]])
    rir = simulate_rir(room, beta, src, mic, nb_img, tmax=tmax, fs=FS, c=C)
    h = rir[0, 0].astype(np.float64)
    # Schroeder backward integration → T60 estimate from -5..-25 dB slope
    edc = np.cumsum(h[::-1] ** 2)[::-1]
    edc_db = 10 * np.log10(edc / edc[0] + 1e-300)
    t = np.arange(len(h)) / FS
    sel = (edc_db < -5) & (edc_db > -25)
    slope = np.polyfit(t[sel], edc_db[sel], 1)[0]  # dB/s
    t60_est = -60.0 / slope
    assert abs(t60_est - t60) / t60 < 0.35  # Sabine is approximate


def test_trajectory_static_equals_direct_convolution(rng):
    sig = rng.standard_normal(4000).astype(np.float32)
    rir = rng.standard_normal((1, 2, 256)).astype(np.float32) * 0.1
    out = simulate_trajectory(sig, rir, timestamps=np.array([0.0]), fs=FS)
    ref = fftconvolve(sig[None, :], rir[0], axes=-1).T
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_trajectory_piecewise_segments(rng):
    """Two trajectory points: each segment convolved with its own RIR."""
    sig = rng.standard_normal(2000).astype(np.float32)
    rirs = np.zeros((2, 1, 64), np.float32)
    rirs[0, 0, 0] = 1.0   # identity
    rirs[1, 0, 1] = 2.0   # delay-1, gain-2
    ts = np.array([0.0, 1000.0 / FS])
    out = simulate_trajectory(sig, rirs, ts, fs=FS)
    np.testing.assert_allclose(out[:1000, 0], sig[:1000], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(out[1001:2001, 0], 2.0 * sig[1000:2000],
                               rtol=1e-5, atol=1e-6)


def test_t2n_orders():
    assert t2n(0.01, [3.43, 3.43, 3.43], c=343.0) == [1, 1, 1]
    assert t2n(0.02, [3.43, 6.86, 3.43], c=343.0) == [1, 1, 1]


def test_native_engine_matches_numpy(rng):
    """C++/OpenMP ISM vs the numpy engine: identical images math."""
    from fnssl_tpu.sim import native

    if not native.native_available():
        import pytest
        pytest.skip("no compiler for the native engine")
    room = [5.0, 4.0, 3.0]
    beta = beta_sabine_estimation(room, 0.3)
    src = rng.uniform(0.5, 2.5, (4, 3))
    mic = rng.uniform(1.0, 2.5, (3, 3))
    a = simulate_rir(room, beta, src, mic, [4, 5, 6], 0.06, FS, C,
                     prefer_native=False)
    b = native.simulate_rir_native(room, beta, src, mic, [4, 5, 6],
                                   0.06, FS, C)
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6)
