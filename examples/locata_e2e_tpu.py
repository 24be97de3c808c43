"""LOCATA end-to-end evaluation with a trained checkpoint (VERDICT r1 #10).

Builds LOCATA-format task-3 recordings (moving speech-like source,
15-mic DICIT array, image-source reverberation via the native C++ ISM
engine, 48 kHz audio + pose/VAD text streams), then drives the
`cli locata` flow — reader → mic-pick 8/5 → STFT features → FN-SSL →
IDL decode → VAD-gated ACC/MAE — exactly as Predict.py:91-104 does.

Needs the trained checkpoint from examples/train_bf16_vs_fp32_tpu.py in
runs/locata_demo. Run: python examples/locata_e2e_tpu.py
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from scipy.signal import resample_poly

from fnssl_tpu.data import SyntheticSpeechDataset, dualch_array_setup  # noqa
from fnssl_tpu.data.arrays import dicit_array_setup
from fnssl_tpu.sim import (
    beta_sabine_estimation, simulate_rir, simulate_trajectory, t2n)
from fnssl_tpu.utils.audio_io import write_audio

REPO = os.path.join(os.path.dirname(__file__), "..")
FS, FS48, DUR = 16000, 48000, 10.0
NPTS = 50


def _write_tsv(path, cols):
    keys = list(cols)
    with open(path, "w") as f:
        f.write("\t".join(keys) + "\n")
        for i in range(len(cols[keys[0]])):
            f.write("\t".join(str(cols[k][i]) for k in keys) + "\n")


def make_recording(out_dir: str, seed: int, azi_range=(40.0, 140.0)):
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    room = np.array([7.0, 6.0, 3.0])
    array_pos = np.array([3.5, 3.0, 1.5])
    t60 = 0.3
    setup = dicit_array_setup()
    mic_world = array_pos + setup.mic_pos            # (15, 3)

    # moving source: azimuth sweep at 2 m, array height (ele 90°)
    ts = np.linspace(0, DUR, NPTS)
    azi = np.radians(np.linspace(*azi_range, NPTS))
    traj = array_pos + 2.0 * np.stack(
        [np.cos(azi), np.sin(azi), np.zeros(NPTS)], axis=1)

    src_ds = SyntheticSpeechDataset(DUR, FS, 1, size=1, return_vad=False)
    src = src_ds.get(seed).ravel().astype(np.float32)
    beta = beta_sabine_estimation(room, t60)
    nb_img = t2n(t60, room)
    rirs = simulate_rir(room, beta, traj, mic_world, nb_img,
                        tmax=t60, fs=FS)
    mic = simulate_trajectory(src, rirs, timestamps=ts * (NPTS - 1) / NPTS,
                              fs=FS)[: int(DUR * FS)]
    # sensor noise @ ~25 dB SNR
    mic = mic / (np.abs(mic).max() + 1e-9) * 0.5
    mic += (rng.standard_normal(mic.shape)
            * (np.sqrt((mic ** 2).mean()) * 10 ** (-25 / 20))
            ).astype(np.float32)

    mic48 = resample_poly(mic, 3, 1, axis=0).astype(np.float32)
    write_audio(os.path.join(out_dir, "audio_array_dicit.wav"), mic48, FS48)
    src48 = resample_poly(src, 3, 1).astype(np.float32)
    write_audio(os.path.join(out_dir, "audio_source_talker1.wav"),
                src48, FS48)

    # array pose: identity rotation at world origin == array frame; the
    # source positions below are therefore written relative to the array
    pose = {"year": [2026] * NPTS, "hour": [10] * NPTS,
            "minute": [0] * NPTS, "second": list(ts),
            "x": [0.0] * NPTS, "y": [0.0] * NPTS, "z": [0.0] * NPTS,
            "ref_vec_x": [1.0] * NPTS, "ref_vec_y": [0.0] * NPTS,
            "ref_vec_z": [0.0] * NPTS}
    for i in range(3):
        for j in range(3):
            pose[f"rotation_{i + 1}{j + 1}"] = [float(i == j)] * NPTS
    _write_tsv(os.path.join(out_dir, "position_array_dicit.txt"), pose)
    _write_tsv(os.path.join(out_dir, "required_time.txt"),
               {"hour": [10] * NPTS, "minute": [0] * NPTS,
                "second": list(ts)})
    rel = traj - array_pos
    _write_tsv(os.path.join(out_dir, "position_source_talker1.txt"),
               {"x": rel[:, 0], "y": rel[:, 1], "z": rel[:, 2]})
    # dataset VAD at 48 kHz from source energy (10 ms windows)
    w = FS48 // 100
    nw = len(src48) // w
    e = (src48[: nw * w].reshape(nw, w) ** 2).mean(1)
    act = (e > 0.05 * np.median(e[e > 1e-12]) + 1e-12).astype(int)
    vad = np.repeat(act, w)
    vad = np.concatenate([vad, np.zeros(len(src48) - len(vad), int)])
    _write_tsv(os.path.join(out_dir, "VAD_dicit_talker1.txt"),
               {"VAD": vad.tolist()})


def main():
    base = "/tmp/locata_e2e"
    for k, azi in enumerate([(40.0, 140.0), (150.0, 60.0)]):
        make_recording(os.path.join(
            base, "task3", f"recording{k + 1}", "dicit"), seed=7 + k,
            azi_range=azi)
    print("fixture recordings written", flush=True)

    # extend (don't clobber) PYTHONPATH: the container's sitecustomize
    # lives on it and registers the TPU plugin
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "fnssl_tpu.cli", "locata",
         "--locata-dir", base, "--log-dir",
         os.path.join(REPO, "runs", "locata_demo"),
         "--out", "/tmp/locata_e2e_result/", "--ae-th", "10"],
        env=env, capture_output=True, text=True, timeout=1800)
    sys.stderr.write(r.stderr[-2000:])
    print(r.stdout.strip())
    last = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    m = json.loads(last)
    print(f"LOCATA end-to-end: ACC@10°={m.get('ACC'):.3f} "
          f"MAE={m.get('MAE'):.2f}° over {m['recordings']} recordings")


if __name__ == "__main__":
    main()
