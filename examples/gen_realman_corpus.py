"""Synthetic corpus in the exact RealMAN on-disk layout (VERDICT r3 #1).

The reference trains IPDnet2 from real recordings through
``RealData`` on-the-fly mixing (IPDnet2/RecordData.py:13-322,
run_IPDnet2.py:36-59): per-channel audio under ``ma_speech`` with
``_CH<i>`` suffixes, a mono direct-path copy under a sibling
``dp_speech`` tree, 10 Hz angle/distance streams in a targets CSV, and
recorded noise with the same channel convention. Real RealMAN audio is
not in this container, so this script synthesizes recordings with the
C++ ISM engine at the true Westlake 5-mic subarray geometry and writes
them in that exact layout — every byte then flows through the REAL
pipeline: ``cli fit --model ipdnet2 --realman-csv ...`` exercises the
per-item-seed sampler, the four overlap modes, dp-energy VAD, and
SNR noise mixing under sustained load.

Each recording is 6 s (longer than the 4 s crop, so random cropping is
exercised), single-speaker (two-source scenes are RealData's job, as
with real recordings), static or moving. Angles are written relative to
the array-geometry origin — the same frame as
``audiowu_high_array_geometry()`` — so the CLI's uncentered
``pos_mics[ids]`` topology is consistent with the targets.

Usage:
  python examples/gen_realman_corpus.py <out_root> <n_train> <n_valid> \
      <n_test> [n_noise]
Layout produced:
  <out_root>/{train,valid,test}/ma_speech/rec<i>_CH{0,1,3,5,7}.wav
  <out_root>/{train,valid,test}/dp_speech/rec<i>.wav
  <out_root>/{train,valid,test}/targets.csv
  <out_root>/noise/amb<i>_CH{0,1,3,5,7}.wav
"""
import os
import re
import sys
import time

sys.path.insert(0, ".")
import numpy as np

FS = 16000
T = 6.0
MIC_IDS = [0, 1, 3, 5, 7]


def _setup():
    from fnssl_tpu.data import (ArraySetup, Parameter,
                                audiowu_high_array_geometry)
    mic = audiowu_high_array_geometry()[MIC_IDS]
    return ArraySetup(arrayType="planar",
                      orV=np.array([0.0, 1.0, 0.0]),
                      mic_scale=Parameter(1), mic_pos=mic.copy(),
                      mic_orV=None, mic_pattern="omni"), mic


def make_dataset(seed: int):
    from fnssl_tpu.data import (NoiseDataset, Parameter,
                                RandomTrajectoryDataset,
                                SyntheticSpeechDataset)
    setup, mic = _setup()
    return RandomTrajectoryDataset(
        sourceDataset=SyntheticSpeechDataset(T, FS, 1),
        num_source=Parameter(1),           # RealMAN recordings are
        source_state="mobile",             # single-speaker; mixing is
        room_sz=Parameter([6, 6, 2.5], [8, 7, 3]),  # RealData's job
        T60=Parameter(0.2, 0.6),
        abs_weights=Parameter([0.5] * 6, [1.0] * 6),
        array_setup=setup,
        array_pos=Parameter([0.3, 0.1, 0.4], [0.7, 0.4, 0.6]),
        noiseDataset=NoiseDataset(
            T, FS, nmic=len(MIC_IDS),
            noise_type=Parameter(["spatial_white"], discrete=True)),
        SNR=Parameter(100, 100),           # recordings are clean;
        nb_points=20,                      # noise is mixed by RealData
        min_dis=Parameter(0.5, 1.5), seed=seed)


def gen_split(out_dir: str, n: int, seed: int, mic_rel: np.ndarray):
    """Simulate n recordings; write ma_speech/dp_speech/CSV."""
    from fnssl_tpu.sim import simulate_rir, simulate_trajectory
    from fnssl_tpu.utils.audio_io import write_audio

    ma = os.path.join(out_dir, "ma_speech")
    dp = os.path.join(out_dir, "dp_speech")
    os.makedirs(ma, exist_ok=True)
    os.makedirs(dp, exist_ok=True)
    ds = make_dataset(seed)
    nt10 = int(T * 10)
    t0 = time.time()
    # Resumable: per-recording CSV rows land in targets.csv.part as
    # each scene completes (scene i is deterministic given the split
    # seed), so an interrupted generation continues where it stopped.
    # A kill mid-append can truncate the final .part line, and an
    # earlier run with a larger n leaves stale rows: only a fully
    # well-formed row whose rec index is < n counts as done — anything
    # else is regenerated and dropped from the final CSV.
    row_re = re.compile(r'^(rec(\d{5}))\.wav,"[^"]*","[^"]*"$')
    part = os.path.join(out_dir, "targets.csv.part")
    done = set()
    if os.path.exists(part):
        with open(part) as f:
            for line in f:
                m = row_re.match(line.rstrip("\n"))
                if m and int(m.group(2)) < n:
                    done.add(f"{m.group(1)}.wav")
    else:
        open(part, "w").close()
    for i in range(n):
        name = f"rec{i:05d}"
        if f"{name}.wav" in done:
            continue
        scene = ds.get_random_scene(i)
        sig = scene.simulate()             # (nsample, 5), SNR 100 ≈ clean
        # mono direct-path at the reference mic (CH0) for the dp-VAD
        dp_rirs = simulate_rir(scene.room_sz, np.zeros(6),
                               scene.traj_pts[:, :, 0],
                               scene.mic_pos[:1], [0, 0, 0], 0.1, FS,
                               scene.c)
        dp_sig = simulate_trajectory(scene.source_signal[:, 0], dp_rirs,
                                     scene.timestamps, FS)[:sig.shape[0],
                                                           0]
        # shared scale keeps inter-channel levels; PCM-safe peak
        scale = 0.9 / max(np.abs(sig).max(), np.abs(dp_sig).max(), 1e-9)
        for k, mid in enumerate(MIC_IDS):
            write_audio(os.path.join(ma, f"{name}_CH{mid}.wav"),
                        (sig[:, k] * scale).astype(np.float32), FS)
        write_audio(os.path.join(dp, f"{name}.wav"),
                    (dp_sig * scale).astype(np.float32), FS)
        # 10 Hz angle/distance streams relative to the GEOMETRY origin
        # (mic 0 sits at the Westlake array origin), matching the
        # uncentered pos_mics[ids] topology RealData returns
        origin = scene.mic_pos[0] - mic_rel[0]
        centers = np.minimum(((np.arange(nt10) * 0.1 + 0.05) * FS)
                             .astype(int), sig.shape[0] - 1)
        rel = scene.trajectory[centers, :, 0] - origin
        ang = np.degrees(np.arctan2(rel[:, 1], rel[:, 0]))
        dist = np.linalg.norm(rel, axis=1)
        angs = ",".join(str(int(round(a))) for a in ang)
        diss = ",".join(f"{d:.2f}" for d in dist)
        with open(part, "a") as f:
            f.write(f'{name}.wav,"{angs}","{diss}"\n')
        if (i + 1) % 100 == 0:
            print(f"{out_dir}: {i + 1}/{n} "
                  f"({(i + 1) / (time.time() - t0):.2f} rec/s)",
                  flush=True)
    with open(part) as f:
        rows = sorted(
            line for line in f
            if (m := row_re.match(line.rstrip("\n")))
            and int(m.group(2)) < n)
    assert len(rows) == n, (
        f"{out_dir}: {len(rows)} well-formed rows for n={n} — "
        "truncated/duplicate .part rows; delete targets.csv.part "
        "entries for the missing recs and re-run")
    with open(os.path.join(out_dir, "targets.csv"), "w") as f:
        f.write('filename,angle(°),distance\n' + "".join(rows))
    print(f"{out_dir}: {n} recordings in {time.time() - t0:.0f}s",
          flush=True)


def gen_noise(out_dir: str, n: int, seed: int):
    from fnssl_tpu.utils.audio_io import write_audio
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        nz = rng.standard_normal(
            (int(15.0 * FS), len(MIC_IDS))).astype(np.float32) * 0.2
        for k, mid in enumerate(MIC_IDS):
            write_audio(os.path.join(out_dir, f"amb{i:02d}_CH{mid}.wav"),
                        nz[:, k], FS)
    print(f"{out_dir}: {n} noise recordings", flush=True)


if __name__ == "__main__":
    root = sys.argv[1]
    n_train, n_valid, n_test = (int(a) for a in sys.argv[2:5])
    n_noise = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    _, mic_rel = _setup()
    gen_noise(os.path.join(root, "noise"), n_noise, seed=999)
    for split, n, seed in (("valid", n_valid, 600),
                           ("test", n_test, 700),
                           ("train", n_train, 500)):
        gen_split(os.path.join(root, split), n, seed, mic_rel)
    print("DONE", flush=True)
