"""End-to-end IPDnet2 (OnlineSpatialNet) training on one TPU chip.

The flagship-model analogue of the reference's RealMAN recipe
(IPDnet2/run_IPDnet2.py fit): 5-mic Westlake subarray, 1-2 moving
sources in reverberant rooms (C++ ISM engine), near-field DP-IPD
targets fused into the jitted train step, bf16 mixed precision,
multi-track IDL decode + Hungarian metrics on held-out scenes.

Scenes are simulated once (per-item-seeded, reproducible) and cached in
memory; training then runs many epochs over the cached batches. Run:

    python examples/train_ipdnet2_tpu.py [epochs]
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fnssl_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from fnssl_tpu.data import (ArraySetup, NoiseDataset, Parameter,
                            RandomTrajectoryDataset, SyntheticSpeechDataset,
                            audiowu_high_array_geometry)
from fnssl_tpu.models.spatialnet import init_spatialnet_params
from fnssl_tpu.train import init_train_state, make_optimizer, make_train_step
from fnssl_tpu.train.tasks import make_ipdnet2_task

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 40
FS, T, BZ, MAX_TRACK = 16000, 4.0, 8, 2
N_TRAIN, N_VALID = 48, 16

MIC = audiowu_high_array_geometry()[[0, 1, 3, 5, 7]]


def westlake5_setup() -> ArraySetup:
    return ArraySetup(arrayType="planar",
                      orV=np.array([0.0, 1.0, 0.0]),
                      mic_scale=Parameter(1), mic_pos=MIC.copy(),
                      mic_orV=None, mic_pattern="omni")


def make_dataset(seed: int):
    return RandomTrajectoryDataset(
        sourceDataset=SyntheticSpeechDataset(T, FS, MAX_TRACK),
        num_source=Parameter([1, 2], discrete=True),
        source_state="mobile",
        room_sz=Parameter([6, 6, 2.5], [8, 7, 3]),
        T60=Parameter(0.2, 0.5),
        abs_weights=Parameter([0.5] * 6, [1.0] * 6),
        array_setup=westlake5_setup(),
        array_pos=Parameter([0.3, 0.1, 0.4], [0.7, 0.4, 0.6]),
        noiseDataset=NoiseDataset(
            T, FS, nmic=MIC.shape[0],
            noise_type=Parameter(["spatial_white"], discrete=True)),
        SNR=Parameter(5, 15), nb_points=20, min_dis=Parameter(0.5, 1.5),
        seed=seed)


def scene_to_sample(mic_signals, scene):
    """(mic_sig, 10 Hz azi/distance/vad, centered topology)."""
    nsample = mic_signals.shape[0]
    nt2 = int(T * 10)
    centers = (np.arange(nt2) * 0.1 + 0.05)
    idx = np.minimum((centers * FS).astype(int), nsample - 1)
    array_pos = scene.mic_pos.mean(axis=0)
    ns = scene.trajectory.shape[-1]
    azi = np.zeros((nt2, MAX_TRACK), np.float32)
    dist = np.ones((nt2, MAX_TRACK), np.float32)
    vad = np.zeros((nt2, MAX_TRACK), np.float32)
    for s in range(ns):
        rel = scene.trajectory[idx, :, s] - array_pos
        azi[:, s] = np.degrees(np.arctan2(rel[:, 1], rel[:, 0]))
        dist[:, s] = np.linalg.norm(rel, axis=1)
        sv = scene.source_vad[:, s].astype(np.float32)
        vad[:, s] = np.array([sv[max(0, i - FS // 20):
                                 i + FS // 20].mean() for i in idx])
    return (mic_signals.astype(np.float32), azi, dist, vad,
            (scene.mic_pos - array_pos).astype(np.float32))


def build_batches(ds, n, bz):
    samples = [scene_to_sample(*ds[i]) for i in range(n)]
    batches = []
    for k in range(0, n - bz + 1, bz):
        cols = list(zip(*samples[k:k + bz]))
        batches.append({
            "mic_sig": np.stack(cols[0]), "azi_deg": np.stack(cols[1]),
            "distance": np.stack(cols[2]), "vad": np.stack(cols[3]),
            "mic_pos": np.stack(cols[4]),
        })
    return batches


def decode_metrics(params, task, batches, pred_doa):
    accs, maes, est_vads = [], [], []
    for b in batches:
        feats, gt = task.preprocess(b["mic_sig"], b["azi_deg"],
                                    b["distance"], b["vad"], b["mic_pos"])
        from fnssl_tpu.models.spatialnet import spatialnet_apply
        pred = spatialnet_apply(params, feats, cfg=task.cfg)
        nt = min(pred.shape[1], b["azi_deg"].shape[1])
        doa_gt = np.stack([np.full((b["azi_deg"].shape[0], nt, MAX_TRACK),
                                   90.0, np.float32),
                           b["azi_deg"][:, :nt]], axis=2)
        dec, _ = pred_doa.pred2doa(np.asarray(pred[:, :nt], np.float32))
        est_vads.append(float(np.mean(np.asarray(dec["vad_sources"]))))
        m = pred_doa.evaluate(
            dec, {"doa": np.radians(doa_gt),
                  "vad_sources": b["vad"][:, :nt]},
            # est-VAD gate at 0.3: the LS-scale VAD needs reference-scale
            # training (300k utts) to saturate toward 1; 48 scenes keep it
            # lower. gt gate matches the reference (0.001).
            vad_th=(0.001, 0.3))
        accs.append(m["ACC"]), maes.append(np.ravel(m["MAE"])[0])
    return (float(np.mean(accs)), float(np.mean(maes)),
            float(np.mean(est_vads)))


def main():
    t0 = time.time()
    train_b = build_batches(make_dataset(seed=1000), N_TRAIN, BZ)
    valid_b = build_batches(make_dataset(seed=9000), N_VALID, BZ)
    print(f"simulated {N_TRAIN}+{N_VALID} scenes in {time.time()-t0:.0f}s",
          flush=True)

    task = make_ipdnet2_task(mic_location=MIC - MIC.mean(axis=0),
                             precision="bf16")
    params = init_spatialnet_params(jax.random.PRNGKey(0), task.cfg)
    tx = make_optimizer("adamw", 5e-4, 0.975, max(len(train_b), 1),
                        grad_clip=5.0)
    state = init_train_state(params, tx)
    step = make_train_step(task.loss_fn, tx)

    from fnssl_tpu.eval.pred_doa import PredDOAMultiTrack
    pred_doa = PredDOAMultiTrack(MIC - MIC.mean(axis=0),
                                 max_track=MAX_TRACK, speed=343.0)
    acc0, mae0, ev0 = decode_metrics(state.params, task, valid_b,
                                     pred_doa)
    print(f"before training: held-out ACC@10 {acc0:.3f} MAE {mae0:.2f} deg"
          f" (mean est-vad {ev0:.3f})", flush=True)

    t0 = time.time()
    for epoch in range(EPOCHS):
        losses = []
        for b in train_b:
            state, loss = step(state, b, None)
            losses.append(float(np.asarray(loss, np.float32)))
        if epoch % 10 == 0 or epoch == EPOCHS - 1:
            print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    train_s = time.time() - t0

    acc1, mae1, ev1 = decode_metrics(state.params, task, valid_b,
                                     pred_doa)
    print(f"after {EPOCHS} epochs ({train_s:.0f}s on-chip): "
          f"held-out ACC@10 {acc1:.3f} MAE {mae1:.2f} deg"
          f" (mean est-vad {ev1:.3f})", flush=True)
    print(f"summary: ACC {acc0:.3f}->{acc1:.3f}, MAE {mae0:.2f}->"
          f"{mae1:.2f} deg, {train_s/EPOCHS:.2f} s/epoch (bf16)")


if __name__ == "__main__":
    main()
