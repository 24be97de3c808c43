"""DP-IPD template/target parity vs the reference numpy implementations."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from fnssl_tpu.physics import (
    DPIPD, DPIPD2, ipd_complex_to_ri, vad_mask_and_sum,
    bessel_nonsource_target, vad_gate_with_nonsource, energy_vad)

from reference_oracle import load_reference_module

MIC2 = np.array([[-0.04, 0.0, 0.0], [0.04, 0.0, 0.0]])
MIC4 = np.array([[-0.06, 0.0, 0.0], [-0.02, 0.0, 0.0],
                 [0.02, 0.0, 0.0], [0.06, 0.0, 0.0]])


def ref_module():
    return load_reference_module("FN-SSL/Module.py", "ref_fnssl_module",
                                 extra_sys_path="/root/reference/FN-SSL")


def ref_module2():
    return load_reference_module("IPDnet2/Module.py", "ref_ipdnet2_module",
                                 extra_sys_path="/root/reference/IPDnet2")


@pytest.mark.parametrize("ch_mode,mic", [("M", MIC2), ("MM", MIC4)])
def test_dpipd_template_matches_reference(ch_mode, mic):
    ref = ref_module().DPIPD(ndoa_candidate=[37, 73], mic_location=mic,
                             nf=257, fre_max=8000, ch_mode=ch_mode,
                             speed=340)
    ours = DPIPD([37, 73], mic, nf=257, fre_max=8000.0, ch_mode=ch_mode,
                 speed=340.0)
    np.testing.assert_allclose(ours.template, ref.dpipd_template, atol=1e-6)
    np.testing.assert_allclose(ours.doa_candidate[0], ref.doa_candidate[0])
    np.testing.assert_allclose(ours.doa_candidate[1], ref.doa_candidate[1])


@pytest.mark.parametrize("ch_mode,mic", [("M", MIC2), ("MM", MIC4)])
def test_dpipd_targets_match_reference(rng, ch_mode, mic):
    ref = ref_module().DPIPD(ndoa_candidate=[9, 17], mic_location=mic,
                             nf=65, fre_max=8000, ch_mode=ch_mode, speed=340)
    ours = DPIPD([9, 17], mic, nf=65, fre_max=8000.0, ch_mode=ch_mode,
                 speed=340.0)
    doa = np.stack([rng.uniform(0, np.pi, (2, 6, 1)),
                    rng.uniform(-np.pi, np.pi, (2, 6, 1))],
                   axis=2).astype(np.float32)  # (nb, nt, 2, ns)
    _, want, _ = ref(source_doa=doa)
    got = np.asarray(ours.targets(jnp.asarray(doa)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dpipd2_template_and_targets_match_reference(rng):
    ref = ref_module2().DPIPD2(ndoa_candidate=[1, 180], mic_location=MIC4,
                               nf=65, fre_max=8000, ch_mode="M", speed=343)
    ours = DPIPD2([1, 180], MIC4, nf=65, fre_max=8000.0, ch_mode="M",
                  speed=343.0)
    np.testing.assert_allclose(ours.template, ref.dpipd_template, atol=1e-6)

    doa = np.stack([np.full((2, 5, 2), np.pi / 2),
                    rng.uniform(-np.pi, np.pi, (2, 5, 2))],
                   axis=2).astype(np.float32)  # (nb, nt, 2, ns)
    dist = rng.uniform(0.5, 3.0, (2, 5, 2)).astype(np.float32)
    _, want = ref(source_doa=doa, source_distance=dist)
    got = np.asarray(ours.targets(jnp.asarray(doa), jnp.asarray(dist)))
    assert got.shape == want.shape
    # fp32 on-device vs the reference's fp64 numpy: phase→exp amplifies
    # rounding; 1e-4 on unit-magnitude values is fp32-tight.
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_vad_mask_and_sum(rng):
    ipd = rng.standard_normal((2, 4, 8, 1, 2)).astype(np.float32)
    vad = np.array([[[1.0, 0.0], [0.5, 0.5], [0.0, 0.0], [1.0, 1.0]],
                    [[0.0, 1.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
                   np.float32)
    out = np.asarray(vad_mask_and_sum(jnp.asarray(ipd), jnp.asarray(vad)))
    want = (ipd * (vad > 0)[:, :, None, None, :]).sum(-1)
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_bessel_nonsource_matches_reference_formula():
    """Oracle: direct scipy evaluation of runIPDnetOn.py:209-221."""
    from scipy.special import jn
    fre_used = range(1, 257)
    got = bessel_nonsource_target(MIC4, fre_used)
    assert got.shape == (512, 3)
    d = np.linalg.norm(MIC4[1:] - MIC4[0], axis=1)
    omega = (2 * np.pi * np.linspace(0, 8000, 257) / 340)[list(fre_used)]
    for p in range(3):
        np.testing.assert_allclose(got[:256, p], jn(0, omega * d[p]),
                                   atol=1e-6)
        np.testing.assert_array_equal(got[256:, p], 0)


def test_vad_gate_with_nonsource_replaces_silent_frames(rng):
    ipd = rng.standard_normal((1, 3, 8, 2, 2)).astype(np.float32)
    nonsource = rng.standard_normal((8, 2)).astype(np.float32)
    vad = np.array([[[1.0, 0.0], [0.0, 0.0], [1.0, 1.0]]], np.float32)
    out = np.asarray(vad_gate_with_nonsource(
        jnp.asarray(ipd), jnp.asarray(vad), jnp.asarray(nonsource)))
    np.testing.assert_allclose(out[0, 0, :, :, 0], ipd[0, 0, :, :, 0])
    np.testing.assert_allclose(out[0, 0, :, :, 1], nonsource)
    np.testing.assert_allclose(out[0, 1, :, :, 0], nonsource)
    np.testing.assert_allclose(out[0, 2], ipd[0, 2])


def test_energy_vad_speech_vs_silence(rng):
    fs = 16000
    sig = np.concatenate([
        0.5 * np.sin(2 * np.pi * 440 * np.arange(fs) / fs),
        np.zeros(fs)]).astype(np.float32)
    vad = energy_vad(sig, fs)
    assert vad[:10].mean() == 1.0
    assert vad[10:].mean() == 0.0
