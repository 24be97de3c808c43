"""LOCATA reader test against a synthetic recording in the LOCATA
directory/file format (48 kHz audio + tab-separated pose/VAD streams)."""
import os

import numpy as np
import pytest

from fnssl_tpu.data.locata import LocataDataset
from fnssl_tpu.utils.audio_io import write_audio


def _write_tsv(path, cols: dict):
    keys = list(cols)
    with open(path, "w") as f:
        f.write("\t".join(keys) + "\n")
        n = len(cols[keys[0]])
        for i in range(n):
            f.write("\t".join(str(cols[k][i]) for k in keys) + "\n")


@pytest.fixture
def locata_dir(tmp_path, rng):
    fs48, dur = 48000, 2.0
    n48 = int(fs48 * dur)
    d = tmp_path / "task3" / "recording1" / "dicit"
    os.makedirs(d)
    # array at origin, identity rotation, static
    npts = 5
    ts = np.linspace(0, dur, npts)
    sig = rng.standard_normal((n48, 15)).astype(np.float32) * 0.5
    sig[: 1000] = 0.0  # leading silence to strip
    write_audio(str(d / "audio_array_dicit.wav"), sig, fs48)
    pose = {"year": [2026] * npts, "hour": [10] * npts,
            "minute": [0] * npts,
            "second": list(ts),
            "x": [0.0] * npts, "y": [0.0] * npts, "z": [0.0] * npts,
            "ref_vec_x": [1.0] * npts, "ref_vec_y": [0.0] * npts,
            "ref_vec_z": [0.0] * npts}
    for i in range(3):
        for j in range(3):
            pose[f"rotation_{i + 1}{j + 1}"] = [float(i == j)] * npts
    _write_tsv(d / "position_array_dicit.txt", pose)
    _write_tsv(d / "required_time.txt",
               {"hour": [10] * npts, "minute": [0] * npts,
                "second": list(ts)})
    # a single static source 2 m away at 45° azimuth in the xy-plane
    src = rng.standard_normal(n48).astype(np.float32)
    write_audio(str(d / "audio_source_talker1.wav"), src, fs48)
    pos = np.array([2 * np.cos(np.pi / 4), 2 * np.sin(np.pi / 4), 0.0])
    _write_tsv(d / "position_source_talker1.txt",
               {"x": [pos[0]] * npts, "y": [pos[1]] * npts,
                "z": [pos[2]] * npts})
    _write_tsv(d / "VAD_dicit_talker1.txt",
               {"VAD": [1] * (n48 // 2) + [0] * (n48 - n48 // 2)})
    return str(tmp_path)


def test_locata_reader(locata_dir):
    from fnssl_tpu.data import Segmenting

    ds = LocataDataset(locata_dir, array="dicit", fs=16000, tasks=(3,),
                       dev=True, transforms=[Segmenting(K=3328, step=3072)])
    assert len(ds) == 1
    mic, gts = ds[0]
    assert mic.shape[1] == 15
    nseg = gts["doa"].shape[0]
    assert gts["doa"].shape == (nseg, 2, 1)
    # static source at 45° azimuth, 90° elevation in the array frame
    np.testing.assert_allclose(np.degrees(gts["doa"][:, 1, 0]), 45.0,
                               atol=0.5)
    np.testing.assert_allclose(np.degrees(gts["doa"][:, 0, 0]), 90.0,
                               atol=0.5)
    # VAD windows carry the per-source dataset VAD
    assert gts["vad_sources"].shape[2] == 1


def test_locata_scene_contract(locata_dir):
    ds = LocataDataset(locata_dir, array="dicit", fs=16000, tasks=(3,),
                       dev=True, return_acoustic_scene=True)
    mic, scene = ds[0]
    assert scene.DOA.shape == (len(mic), 2, 1)
    assert scene.mic_vad_sources.shape == (len(mic), 1)
    # dataset VAD: first-half active ratio ≈ 0.5 after silence strip
    ratio = scene.mic_vad_sources.mean()
    assert 0.3 < ratio < 0.7


def test_cli_locata_ipd_baseline(locata_dir, tmp_path, monkeypatch,
                                 capsys):
    """`cli locata --model ipd_baseline` evaluates the DNN-free path on
    LOCATA-format recordings — no checkpoint, VAD-gated metrics + npy
    dumps (the reference's wDNN=False on its Predict flow)."""
    from fnssl_tpu.cli.main import main

    monkeypatch.chdir(tmp_path)
    main(["locata", "--model", "ipd_baseline", "--locata-dir", locata_dir,
          "--tasks", "3", "--out", "loc_base/"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json
    res = json.loads(out)
    assert res["recordings"] == 1
    assert np.isfinite(res["MAE"])
    assert os.path.exists("loc_base/0_est.npy")
