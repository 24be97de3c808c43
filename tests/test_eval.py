"""Eval-layer parity tests against the reference torch implementation."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch

from fnssl_tpu.eval import (
    PredDOA, get_metric_multiple, get_metric_single, idl_decode, pd_decode,
    spatial_spectrum)
from tests.reference_oracle import load_reference_module


@pytest.fixture(scope="module")
def ref_module():
    return load_reference_module("FN-SSL/Lightning/Module.py", "ref_module",
                                 extra_sys_path="/root/reference/FN-SSL")


def _rand_decode_inputs(rng, nb=2, nt=5, f=16, p=1, nele=3, nazi=9):
    pred = rng.standard_normal((nb, nt, f, p)).astype(np.float32)
    tmpl = rng.standard_normal((nele, nazi, f, p)).astype(np.float32)
    ele = np.linspace(0, np.pi, nele)
    azi = np.linspace(-np.pi, np.pi, nazi)
    return pred, tmpl, ele, azi


def test_idl_decode_matches_reference(ref_module, rng):
    pred, tmpl, ele, azi = _rand_decode_inputs(rng)
    ref = ref_module.SourceDetectLocalize(
        max_num_sources=2, source_num_mode="unkNum", meth_mode="IDL")
    r_doa, r_vad, r_ss = ref(torch.from_numpy(pred),
                             torch.from_numpy(tmpl), [ele, azi])
    res = idl_decode(jnp.asarray(pred), jnp.asarray(tmpl),
                     jnp.asarray(ele), jnp.asarray(azi),
                     max_num_sources=2, source_num_mode="unkNum")
    np.testing.assert_allclose(np.asarray(res.spatial_spectrum),
                               r_ss.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.doa), r_doa.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.vad), r_vad.numpy(),
                               rtol=1e-3, atol=1e-5)


def test_pd_decode_matches_reference(ref_module, rng):
    """Reference quirk: the PD path's (ns,1)-shaped unravel indices make
    `pred_DOA.transpose(1,0)` a (1,ns,2) tensor that broadcasts into the
    (2,ns) slot *transposed* (Module.py:608-614) — i.e. reference PD
    emits (src, angle) instead of (angle, src). We produce the intended
    layout, so the oracle comparison transposes the reference output.
    """
    pred, tmpl, ele, azi = _rand_decode_inputs(rng, nb=1, nt=3, f=32,
                                               nele=7, nazi=13)
    ref = ref_module.SourceDetectLocalize(
        max_num_sources=2, source_num_mode="unkNum", meth_mode="PD")
    r_doa, r_vad, _ = ref(torch.from_numpy(pred),
                          torch.from_numpy(tmpl), [ele, azi])
    res = pd_decode(jnp.asarray(pred), jnp.asarray(tmpl),
                    jnp.asarray(ele), jnp.asarray(azi),
                    max_num_sources=2, source_num_mode="unkNum")
    np.testing.assert_allclose(np.asarray(res.doa),
                               r_doa.numpy().transpose(0, 1, 3, 2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.vad), r_vad.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_track_associate_matches_reference_track_branch(rng):
    """The dormant permutation tracker (track_enable branch,
    FN-SSL/Module.py:623-644): the oracle is the reference exec'd with
    the flag patched on; ours is ``track=True`` on idl_decode."""
    from fnssl_tpu.eval import track_associate

    ref_mod = load_reference_module(
        "FN-SSL/Lightning/Module.py", "ref_module_tracked",
        extra_sys_path="/root/reference/FN-SSL",
        patches=(("track_enable = False", "track_enable = True"),))
    pred, tmpl, ele, azi = _rand_decode_inputs(rng, nb=3, nt=12, f=24,
                                               nele=5, nazi=17)
    ref = ref_mod.SourceDetectLocalize(
        max_num_sources=2, source_num_mode="unkNum", meth_mode="IDL")
    r_doa, r_vad, _ = ref(torch.from_numpy(pred),
                          torch.from_numpy(tmpl), [ele, azi])
    res = idl_decode(jnp.asarray(pred), jnp.asarray(tmpl),
                     jnp.asarray(ele), jnp.asarray(azi),
                     max_num_sources=2, source_num_mode="unkNum",
                     track=True)
    np.testing.assert_allclose(np.asarray(res.doa), r_doa.numpy(),
                               rtol=1e-5, atol=1e-6)
    # reference leaves VADs unpermuted; replicated
    np.testing.assert_allclose(np.asarray(res.vad), r_vad.numpy(),
                               rtol=1e-3, atol=1e-5)

    # sequential carry property: the reordered frame (not the raw one)
    # anchors the next association step — single-frame and identity cases
    one = jnp.asarray(rng.standard_normal((2, 1, 2, 2)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(track_associate(one)),
                                  np.asarray(one))
    const = jnp.tile(jnp.asarray([[0.3], [1.2]])[None, None], (1, 6, 1, 1))
    np.testing.assert_array_equal(np.asarray(track_associate(const)),
                                  np.asarray(const))


def test_track_associate_reorders_swapped_tracks():
    """Two sources swapping slots mid-sequence get re-associated into
    stable tracks (the capability the branch exists for)."""
    from fnssl_tpu.eval import track_associate

    nt = 8
    a = np.stack([np.full(nt, 0.5), np.full(nt, 1.0)], -1)   # ele per src
    b = np.stack([np.full(nt, 1.0), np.full(nt, 2.5)], -1)   # azi per src
    doa = np.stack([a, b], axis=1)[None].astype(np.float32)  # (1,nt,2,2)
    swapped = doa.copy()
    swapped[:, 4:] = swapped[:, 4:, :, ::-1]                 # swap at t=4
    out = np.asarray(track_associate(jnp.asarray(swapped)))
    np.testing.assert_allclose(out, doa, atol=1e-7)


def test_metric_single_matches_reference(ref_module, rng):
    nb, nt, ns = 3, 8, 1
    doa_gt = rng.uniform(0, 180, (nb, nt, 2, ns))
    doa_est = doa_gt + rng.normal(0, 10, (nb, nt, 2, ns))
    vad_gt = rng.uniform(0, 1, (nb, nt, ns))
    vad_est = rng.uniform(0, 1, (nb, nt, ns))
    ref = ref_module.getMetric(source_mode="single")
    r = ref(torch.from_numpy(doa_gt), torch.from_numpy(vad_gt),
            torch.from_numpy(doa_est), torch.from_numpy(vad_est),
            ae_mode=["azi"], ae_TH=30, useVAD=True, vad_TH=[2 / 3, 2 / 3])
    mine = get_metric_single(doa_gt, vad_gt, doa_est, vad_est,
                             ae_mode=("azi",), ae_th=30, use_vad=True,
                             vad_th=(2 / 3, 2 / 3))
    assert mine["ACC"] == pytest.approx(float(torch.as_tensor(r["ACC"]).reshape(-1)[0]), abs=1e-6)
    assert mine["MAE"] == pytest.approx(float(torch.as_tensor(r["MAE"]).reshape(-1)[0]), abs=1e-4)


def test_metric_multiple_matches_reference(ref_module, rng):
    nb, nt, ns = 2, 6, 2
    doa_gt = rng.uniform(0, 180, (nb, nt, 2, ns))
    doa_est = doa_gt[..., ::-1] + rng.normal(0, 8, (nb, nt, 2, ns))
    vad_gt = rng.uniform(0, 1, (nb, nt, ns))
    vad_est = rng.uniform(0, 1, (nb, nt, ns))
    ref = ref_module.getMetric(source_mode="multiple")
    r = ref(torch.from_numpy(doa_gt), torch.from_numpy(vad_gt),
            torch.from_numpy(doa_est), torch.from_numpy(vad_est),
            ae_mode=["azi"], ae_TH=30, useVAD=True, vad_TH=[2 / 3, 0.2])
    mine = get_metric_multiple(doa_gt, vad_gt, doa_est, vad_est,
                               ae_mode=("azi",), ae_th=30, use_vad=True,
                               vad_th=(2 / 3, 0.2))
    for k in ("ACC", "MDR", "FAR", "MAE", "RMSE"):
        assert mine[k] == pytest.approx(float(r[k][0]), abs=1e-4), k


def test_pred_doa_end_to_end_matches_reference(ref_module, rng):
    """Full predgt2DOA path on a random FN-SSL-shaped output."""
    nb, p, nt, f = 2, 1, 6, 512
    pred = rng.standard_normal((nb * p, nt, f)).astype(np.float32)
    gt = {"doa": rng.uniform(0, np.pi, (nb, nt, 2, 1)).astype(np.float32),
          "vad_sources": np.ones((nb, nt, 1), np.float32)}

    ref = ref_module.PredDOA(device="cpu")
    r_pred, _ = ref.predgt2DOA(
        pred_batch=torch.from_numpy(pred),
        gt_batch={k: torch.from_numpy(v) for k, v in gt.items()})

    mine = PredDOA()
    m_pred, _ = mine.predgt2doa(pred, gt)
    np.testing.assert_allclose(np.asarray(m_pred["doa"]),
                               r_pred["doa"].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_pred["vad_sources"]),
                               r_pred["vad_sources"].numpy(),
                               rtol=1e-3, atol=1e-4)
    # metrics agree end-to-end as well
    r_metric = ref.evaluate(pred={k: v for k, v in r_pred.items()},
                            gt={k: torch.from_numpy(v)
                                for k, v in gt.items()})
    m_metric = mine.evaluate(m_pred, gt)
    assert m_metric["ACC"] == pytest.approx(float(torch.as_tensor(r_metric["ACC"]).reshape(-1)[0]),
                                            abs=1e-5)
    assert m_metric["MAE"] == pytest.approx(float(torch.as_tensor(r_metric["MAE"]).reshape(-1)[0]),
                                            abs=1e-3)


def test_spatial_spectrum_peak_at_true_doa():
    """Physics sanity: decoding a clean template recovers its own DOA."""
    pd = PredDOA()
    tmpl = np.asarray(pd.template)        # (1, 37, 2nf, P)
    true_idx = 20
    ipd = tmpl[0, true_idx][None, None]   # (1, 1, 2nf, P)
    ss = spatial_spectrum(jnp.asarray(ipd), pd.template)
    assert int(jnp.argmax(ss[0, 0, 0])) == true_idx


def test_ipd_baseline_localizes_simulated_source(rng):
    """DNN-free cross-spectrum IPD decode recovers a simulated DOA."""
    from fnssl_tpu.eval import ipd_baseline
    from fnssl_tpu.sim import simulate_rir, simulate_trajectory

    fs, c = 16000, 340.0  # decoder templates use speed 340
    arr_c = np.array([3.0, 2.5, 1.5])
    mics = arr_c + np.array([[-0.04, 0, 0], [0.04, 0, 0]])
    azi_true = np.deg2rad(55.0)
    src = arr_c + 1.5 * np.array([np.cos(azi_true), np.sin(azi_true), 0])
    rirs = simulate_rir([6, 5, 3], np.zeros(6), src[None], mics,
                        [0, 0, 0], 0.05, fs, c)
    sig = rng.standard_normal(16000).astype(np.float32)
    mic_sig = simulate_trajectory(sig, rirs, np.array([0.0]), fs)[:16000]

    decoder = PredDOA()
    pred = ipd_baseline(mic_sig[None], decoder)
    est = np.degrees(np.asarray(pred["doa"][0, :, 1, 0]))
    assert abs(np.median(est) - 55.0) < 6.0, np.median(est)


def test_multitrack_pred_doa(rng, tmp_path):
    """Per-track IDL decode: ideal 2-track IPD recovers both DOAs."""
    from fnssl_tpu.eval import PredDOAMultiTrack

    mic = np.array([[-0.04, 0, 0], [0.04, 0, 0]])
    mt = PredDOAMultiTrack(mic, save_dir=str(tmp_path))
    # build ideal per-track IPD from the decode template itself
    tmpl = np.asarray(mt.template)           # (1, 180, 2nf, P)
    i1, i2 = 40, 130
    nb, nt = 2, 5
    pred = np.zeros((nb, nt, tmpl.shape[2], tmpl.shape[3], 2), np.float32)
    pred[..., 0] = tmpl[0, i1]
    pred[..., 1] = tmpl[0, i2]
    gt_doa = np.zeros((nb, nt, 2, 2), np.float32)
    gt_doa[:, :, 0] = np.pi / 2
    gt_doa[:, :, 1, 0] = mt.azi_candidate[i1]
    gt_doa[:, :, 1, 1] = mt.azi_candidate[i2]
    gt = {"doa": gt_doa, "vad_sources": np.ones((nb, nt, 2), np.float32)}
    metric = mt(pred, gt, idx=3)
    assert metric["ACC"] == pytest.approx(1.0)
    assert metric["MAE"] == pytest.approx(0.0, abs=1e-4)
    import os
    assert os.path.exists(tmp_path / "3_doaest.npy")


def test_multitrack_scale_norm_makes_gate_scale_invariant(rng):
    """scale_norm='utterance' (BASELINE.md r4 cross-geometry fix): a
    uniformly deflated LS-score distribution — the template-mismatch
    signature on an unseen array — clears the published 0.5 gate after
    per-utterance normalization, while a well-scaled utterance in the
    SAME batch is left untouched (normalizer floored at the gate)."""
    from fnssl_tpu.eval import PredDOAMultiTrack

    mic = np.array([[-0.04, 0, 0], [0.04, 0, 0]])
    raw = PredDOAMultiTrack(mic)
    norm = PredDOAMultiTrack(mic, scale_norm="utterance")
    tmpl = np.asarray(raw.template)          # (1, 180, 2nf, P)
    i1, i2 = 40, 130
    nb, nt = 2, 5
    pred = np.zeros((nb, nt, tmpl.shape[2], tmpl.shape[3], 2), np.float32)
    pred[..., 0] = tmpl[0, i1]
    pred[..., 1] = tmpl[0, i2]
    pred[1] *= 0.35          # utterance 1: deflated scores (LS scale .35)
    gt_doa = np.zeros((nb, nt, 2, 2), np.float32)
    gt_doa[:, :, 0] = np.pi / 2
    gt_doa[:, :, 1, 0] = raw.azi_candidate[i1]
    gt_doa[:, :, 1, 1] = raw.azi_candidate[i2]
    gt = {"doa": gt_doa, "vad_sources": np.ones((nb, nt, 2), np.float32)}

    p_raw, _ = raw.pred2doa(pred)
    p_norm, _ = norm.pred2doa(pred)
    v_raw = np.asarray(p_raw["vad_sources"])
    v_norm = np.asarray(p_norm["vad_sources"])
    # utterance 0 is well-scaled (LS scale ~1): normalization is a no-op
    np.testing.assert_allclose(v_norm[0], v_raw[0], atol=1e-5)
    # utterance 1: raw scores sit under the published gate, normalized
    # scores clear it (0.35 / max(q95~0.35, floor 0.5) = 0.7)
    assert v_raw[1].max() < 0.5
    assert v_norm[1].min() > 0.5
    # and the metrics at the published gate recover cross-"geometry"
    m_raw = raw.evaluate(*raw.pred2doa(pred, gt))
    m_norm = norm.evaluate(*norm.pred2doa(pred, gt))
    assert m_raw["ACC"] <= 0.5          # deflated utterance undetected
    assert m_norm["ACC"] == pytest.approx(1.0)
    assert m_norm["MAE"] == pytest.approx(0.0, abs=1e-4)


def test_mse_decode_recovers_and_scores(rng):
    """IPDnet2 MSE decode: exact template → its grid DOA with score 0;
    inverted-comparator metric path accepts low-MSE detections."""
    from fnssl_tpu.eval import mse_decode

    nele, nazi, f, p = 1, 73, 32, 1
    tmpl = rng.standard_normal((nele, nazi, f, p)).astype(np.float32)
    ele = np.full(1, np.pi / 2)
    azi = np.linspace(-np.pi, np.pi, nazi)
    idx = 50
    pred = np.broadcast_to(tmpl[0, idx], (1, 4, f, p)).astype(np.float32)
    res = mse_decode(jnp.asarray(pred), jnp.asarray(tmpl),
                     jnp.asarray(ele), jnp.asarray(azi), 1, "unkNum")
    np.testing.assert_allclose(np.asarray(res.doa[0, :, 1, 0]), azi[idx],
                               atol=1e-6)
    assert float(res.vad.max()) < 1e-8  # perfect match → MSE 0
    # inverted-comparator metric: low score counts as active
    gt = {"doa": np.degrees(np.stack(
        [np.full((1, 4), np.pi / 2), np.full((1, 4), azi[idx])],
        axis=2))[..., None],
        "vad": np.ones((1, 4, 1))}
    m = get_metric_multiple(gt["doa"], gt["vad"],
                            np.degrees(np.asarray(res.doa)),
                            np.asarray(res.vad) / 0.2919,
                            ae_th=10, vad_th=(0.5, 0.4),
                            invert_est_vad=True)
    assert m["ACC"] == pytest.approx(1.0)
