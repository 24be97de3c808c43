"""Data-pipeline tests: diffuse-noise coherence, segmenting parity,
generate→read→train-batch contract."""
import numpy as np
import pytest
import scipy.signal

from fnssl_tpu.data import (
    AcousticScene, FixTrajectoryDataset, Parameter, Segmenting,
    SyntheticSpeechDataset, collate_segmented, dualch_array_setup,
    gen_diffuse_noise, generate, load_file, make_fnssl_trajectory_dataset)
from tests.reference_oracle import load_reference_module


def test_parameter_sampling(rng):
    p = Parameter(1.0)
    assert p.get_value(rng) == 1.0
    p = Parameter([0.0, 0.0], [1.0, 2.0])
    v = p.get_value(rng)
    assert v.shape == (2,) and 0 <= v[0] <= 1 and 0 <= v[1] <= 2
    p = Parameter(["a", "b"], discrete=True)
    assert p.get_value(rng) in ("a", "b")


def test_diffuse_noise_spatial_coherence(rng):
    """Generated diffuse noise must exhibit ~sinc coherence between mics."""
    fs, T, c = 16000, 4.0, 343.0
    mic_pos = np.array([[0.0, 0, 0], [0.2, 0, 0]])
    mono = rng.standard_normal(int(2 * T * fs))
    x = gen_diffuse_noise(mono, T, fs, mic_pos, c=c)
    assert x.shape == (int(T * fs), 2)
    f, cxy = scipy.signal.coherence(x[:, 0], x[:, 1], fs=fs, nperseg=256)
    expected = np.sinc(2 * f * 0.2 / c) ** 2  # magnitude-squared coherence
    sel = f < 4000
    err = np.abs(cxy[sel] - expected[sel]).mean()
    assert err < 0.1, err


def test_segmenting_matches_reference(rng):
    ref_ds = load_reference_module(
        "FN-SSL/Dataset.py", "ref_dataset",
        extra_sys_path="/root/reference/FN-SSL",
        stub_modules=("soundfile", "webrtcvad", "gpuRIR"))
    fs, L, ns = 16000, 4 * 16000, 2
    doa = np.cumsum(rng.normal(0, 0.01, (L, 2, ns)), axis=0) + 1.0
    vad_sources = (rng.random((L, ns)) > 0.5).astype(float)
    x = rng.standard_normal((L, 2))

    def make_scene():
        sc = AcousticScene.empty()
        sc.DOA = doa.copy()
        sc.mic_vad_sources = vad_sources.copy()
        sc.fs = fs
        return sc

    r_scene = make_scene()
    _, r_scene = ref_ds.Segmenting_SRPDNN(K=3328, step=3072)(x, r_scene)
    m_scene = make_scene()
    _, m_scene = Segmenting(K=3328, step=3072)(x, m_scene)

    np.testing.assert_allclose(m_scene.DOAw, r_scene.DOAw,
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(m_scene.mic_vad_sources,
                               r_scene.mic_vad_sources)
    np.testing.assert_allclose(m_scene.tw, r_scene.tw)


def test_segmenting_azimuth_wrap():
    """Windows straddling the ±π azimuth jump average circularly."""
    L, fs = 3328 * 2, 16000
    sc = AcousticScene.empty()
    azi = np.full(L, np.pi - 0.05)
    azi[1::2] = -np.pi + 0.05  # oscillates across the wrap
    sc.DOA = np.stack([np.full(L, np.pi / 2), azi], axis=1)[:, :, None]
    sc.fs = fs
    _, sc = Segmenting(K=3328, step=3072)(np.zeros((L, 2)), sc)
    # circular mean of ±(π−0.05) is π (or −π), not 0
    assert np.all(np.abs(np.abs(sc.DOAw[:, 1, 0]) - np.pi) < 0.06)


def test_generate_read_train_contract(tmp_path):
    """End-to-end data contract: generate tiny set → read → train batch."""
    ds = make_fnssl_trajectory_dataset(T=1.0, nb_points=8, seed=7)
    out = generate(str(tmp_path), num=2, dataset=ds)
    fix = FixTrajectoryDataset(out, transforms=[Segmenting()])
    assert len(fix) == 2
    item = fix[0]
    mic, gts = item
    assert mic.shape == (16000, 2)
    nseg = gts["doa"].shape[0]
    assert gts["doa"].shape == (nseg, 2, 1)
    assert gts["vad_sources"].shape == (nseg, 3328, 1)
    batch = collate_segmented([fix[0], fix[1]])
    assert batch["mic_sig"].shape == (2, 16000, 2)
    assert batch["doa"].shape == (2, nseg, 2, 1)
    assert batch["vad"].shape == (2, nseg, 1)
    # determinism: same idx → identical signal
    again = FixTrajectoryDataset(out, transforms=[Segmenting()])[0][0]
    np.testing.assert_array_equal(mic, again)


def test_generate_compact_matches_full(tmp_path):
    """generate(compact=True) stores the same training labels as the
    wav+pickle contract, with the mic signal within int16 quantization;
    FixTrajectoryDataset reads both transparently and collates
    identically-shaped batches."""
    ds = make_fnssl_trajectory_dataset(T=1.0, nb_points=8, seed=7)
    full = generate(str(tmp_path / "full"), num=2, dataset=ds)
    comp = generate(str(tmp_path / "comp"), num=2, dataset=ds,
                    compact=True)
    fix_f = FixTrajectoryDataset(full, transforms=[Segmenting()])
    fix_c = FixTrajectoryDataset(comp)
    assert fix_c.compact and len(fix_c) == 2
    for i in range(2):
        mic_f, gts_f = fix_f[i]
        mic_c, gts_c = fix_c[i]
        step = np.abs(mic_f).max() / 0.95 / 32767  # int16 LSB
        np.testing.assert_allclose(mic_c, mic_f, atol=0.55 * step)
        np.testing.assert_allclose(gts_c["doa"], gts_f["doa"], atol=1e-6)
        # compact VAD is the stored window mean; K axis collapses to 1
        np.testing.assert_allclose(
            gts_c["vad_sources"][:, 0],
            gts_f["vad_sources"].mean(axis=1), atol=1e-6)
    bf = collate_segmented([fix_f[0], fix_f[1]], pad_tracks=2)
    bc = collate_segmented([fix_c[0], fix_c[1]], pad_tracks=2)
    for k in bf:
        assert bf[k].shape == bc[k].shape
        np.testing.assert_allclose(bc[k], bf[k], atol=2e-4)
    # resume: re-running generate skips existing files untouched
    before = sorted((tmp_path / "comp").iterdir())
    mtimes = [p.stat().st_mtime_ns for p in before]
    generate(str(tmp_path / "comp"), num=2, dataset=ds, compact=True)
    assert [p.stat().st_mtime_ns for p in before] == mtimes


def test_scene_reproducible_per_seed():
    ds = make_fnssl_trajectory_dataset(T=0.5, nb_points=4, seed=3)
    a = ds.get_random_scene(5)
    b = ds.get_random_scene(5)
    np.testing.assert_array_equal(a.traj_pts, b.traj_pts)
    np.testing.assert_array_equal(a.source_signal, b.source_signal)
    c = ds.get_random_scene(6)
    assert not np.array_equal(a.traj_pts, c.traj_pts)


def test_simulated_doa_matches_gcc_delay():
    """Physics: a static broadside vs endfire source produces the expected
    inter-mic delay sign in the simulated signals."""
    from fnssl_tpu.data import NoiseDataset
    from fnssl_tpu.data.trajectory import RandomTrajectoryDataset

    T, fs = 0.5, 16000
    src_ds = SyntheticSpeechDataset(T, fs, 1)
    noise = NoiseDataset(T, fs, 2,
                         Parameter(["spatial_white"], discrete=True))
    ds = RandomTrajectoryDataset(
        sourceDataset=src_ds, num_source=Parameter(1),
        source_state="static", room_sz=Parameter([6, 6, 3]),
        T60=Parameter(0.2), abs_weights=Parameter([1.0] * 6),
        array_setup=dualch_array_setup(),
        array_pos=Parameter([0.5, 0.2, 0.5]),
        noiseDataset=noise, SNR=Parameter(30), nb_points=4,
        min_dis=Parameter(1.0), seed=11)
    scene = ds.get_random_scene(0)
    sig = scene.simulate()
    # ground-truth azimuth vs GCC-PHAT delay between the two mics
    azi = scene.DOA[0, 1, 0]
    corr = scipy.signal.correlate(sig[:, 1], sig[:, 0], mode="full")
    lag = np.argmax(corr) - (len(sig) - 1)
    # mic1 is displaced +x: path difference d1-d0 = -baseline·cos(azi),
    # so sig1 leads by baseline·cos(azi)/c → negative correlation lag
    expected_tau = -0.08 * np.cos(azi) / 343.0 * fs
    assert abs(lag - expected_tau) <= 1.5, (lag, expected_tau)


def test_native_vad_matches_numpy(rng):
    from fnssl_tpu.data.vad import frame_vad
    from fnssl_tpu.sim import native

    if not native.vad_available():
        import pytest
        pytest.skip("no compiler for native VAD")
    sig = (rng.standard_normal(16000) *
           np.repeat(rng.random(100) > 0.5, 160)).astype(np.float64)
    got = frame_vad(sig, 16000, aggressiveness=2)        # native path
    # numpy reference computed inline (float64)
    flen = 160
    n = len(sig) // flen
    frames = sig[: n * flen].reshape(n, flen)
    e = 10 * np.log10(np.mean(frames ** 2, axis=1) + 1e-12)
    expected = np.repeat(
        (e > np.percentile(e, 5.0) + 6.0).astype(float), flen)
    # float32 energies in the native core may flip threshold-grazing
    # frames; require ≥99% agreement
    agree = np.mean(got[: n * flen] == expected)
    assert agree > 0.99, agree


def test_collate_segmented_mixed_source_counts():
    """A batch mixing 1- and 2-source items must pad per item (the
    reference pads per item, IPDnet/Dataset.py:518-534)."""
    from fnssl_tpu.data import collate_segmented

    def item(ns):
        sig = np.zeros((800, 2), np.float32)
        gt = {"doa": np.ones((3, 2, ns), np.float32),
              "vad_sources": np.ones((3, 5, ns), np.float32)}
        return sig, gt

    batch = collate_segmented([item(1), item(2)], pad_tracks=2)
    assert batch["doa"].shape == (2, 3, 2, 2)
    assert batch["vad"].shape == (2, 3, 2)
    assert (batch["doa"][0, :, :, 1] == 0).all()   # padded track zeroed
    assert (batch["vad"][0, :, 1] == 0).all()
    assert (batch["vad"][1] == 1).all()
