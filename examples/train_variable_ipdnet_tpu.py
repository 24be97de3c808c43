"""Variable-array IPDnet: one model trained across array geometries.

The array-agnostic variant (IPDnet/VariableArrayIPDnet.py — the shipped
reference file crashes as delivered; this implements the intended
pair-mean-embedding design): microphone pairs ride the batch axis, so
the same parameters train on arrays with different microphone counts.
Here one parameter set is trained on 2-, 3- and 4-mic linear arrays
(one jit trace per topology) and evaluated on a *held-out* 3-mic
geometry with a different spacing — the cross-array generalization the
architecture exists for.

Run: python examples/train_variable_ipdnet_tpu.py [epochs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fnssl_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from fnssl_tpu.data import (ArraySetup, NoiseDataset, Parameter, Segmenting,
                            SyntheticSpeechDataset, collate_segmented)
from fnssl_tpu.data.trajectory import RandomTrajectoryDataset
from fnssl_tpu.eval.pred_doa import PredDOAMultiTrack
from fnssl_tpu.models.ipdnet import (init_variable_ipdnet_params,
                                     variable_ipdnet_apply)
from fnssl_tpu.train import init_train_state, make_optimizer, make_train_step
from fnssl_tpu.train.tasks import make_variable_ipdnet_task

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
T, FS = 3.0, 16000
N_PER_GEOM, N_DEV = 24, 8


def linear_mics(n, spacing):
    x = (np.arange(n) - (n - 1) / 2.0) * spacing
    return np.stack([x, np.zeros(n), np.zeros(n)], 1)


TRAIN_GEOMS = [linear_mics(2, 0.08), linear_mics(3, 0.06),
               linear_mics(4, 0.05)]
HELDOUT_GEOM = linear_mics(3, 0.09)         # unseen spacing AND aperture


def make_ds(mic, seed):
    setup = ArraySetup(arrayType="planar", orV=np.array([0.0, 1.0, 0.0]),
                       mic_scale=Parameter(1), mic_pos=mic.copy(),
                       mic_orV=None, mic_pattern="omni")
    return RandomTrajectoryDataset(
        sourceDataset=SyntheticSpeechDataset(T, FS, 2, size=4096),
        num_source=Parameter([1, 2], discrete=True),
        source_state="mobile",
        room_sz=Parameter([6, 5, 3], [9, 7, 4]),
        T60=Parameter(0.2, 0.5), abs_weights=Parameter([0.8] * 6),
        array_setup=setup,
        array_pos=Parameter([0.3, 0.1, 0.4], [0.7, 0.4, 0.6]),
        noiseDataset=NoiseDataset(T, FS, mic.shape[0],
                                  Parameter(["spatial_white"],
                                            discrete=True)),
        SNR=Parameter(5, 20), nb_points=8, min_dis=Parameter(0.6, 1.5),
        seed=seed)


def scenes(ds, idxs, seed0):
    seg = Segmenting()
    out = []
    for i in idxs:
        sig, scene = ds[(i, seed0 + i)]
        sig, scene = seg(sig, scene)
        out.append(collate_segmented(
            [(sig.astype(np.float32),
              {"doa": scene.DOAw.astype(np.float32),
               "vad_sources": scene.mic_vad_sources})], pad_tracks=2))
    return out


t0 = time.time()
train_sets = []
for g, mic in enumerate(TRAIN_GEOMS):
    ds = make_ds(mic, seed=400 + g)
    train_sets.append((mic, scenes(ds, range(N_PER_GEOM), 60_000 * (g + 1))))
dev_scenes = scenes(make_ds(HELDOUT_GEOM, seed=990), range(5000, 5000 + N_DEV),
                    7_000_000)
print(f"data gen ({3 * N_PER_GEOM}+{N_DEV} scenes, 4 geometries): "
      f"{time.time()-t0:.0f}s", flush=True)

# one parameter set; a task + jitted step per topology (new trace per
# array, exactly the VariableArrayIPDnet contract)
tx = make_optimizer("adam", 5e-4, 0.975, 3 * N_PER_GEOM)
tasks, steps = [], []
for mic, _ in train_sets:
    task = make_variable_ipdnet_task(mic_location=mic, precision="bf16")
    tasks.append(task)
    steps.append(make_train_step(task.loss_fn, tx))
params = init_variable_ipdnet_params(jax.random.PRNGKey(0), tasks[0].cfg)
state = init_train_state(params, tx)

eval_task = make_variable_ipdnet_task(mic_location=HELDOUT_GEOM)
pred_doa = PredDOAMultiTrack(HELDOUT_GEOM, max_track=2, ch_mode="MM",
                             speed=340.0)


def evaluate(p):
    accs, maes = [], []
    for b in dev_scenes:
        feats, gt = eval_task.preprocess(b["mic_sig"], b["doa"], b["vad"])
        pred = variable_ipdnet_apply(p, feats, cfg=eval_task.cfg)
        nt = min(pred.shape[1], b["doa"].shape[1])
        dec, _ = pred_doa.pred2doa(np.asarray(pred[:, :nt], np.float32))
        m = pred_doa.evaluate(dec, {"doa": b["doa"][:, :nt],
                                    "vad_sources": b["vad"][:, :nt]},
                              vad_th=(0.001, 0.3))
        accs.append(m["ACC"]), maes.append(np.ravel(m["MAE"])[0])
    return float(np.mean(accs)), float(np.mean(maes))


acc0, mae0 = evaluate(state.params)
print(f"before: held-out-array ACC@10 {acc0:.3f} MAE {mae0:.2f} deg",
      flush=True)

t0 = time.time()
for epoch in range(EPOCHS):
    losses = []
    order = [(g, i) for g in range(len(train_sets))
             for i in range(N_PER_GEOM)]
    np.random.default_rng(epoch).shuffle(order)
    for g, i in order:                     # interleave array topologies
        state, loss = steps[g](state, train_sets[g][1][i], None)
        losses.append(float(np.asarray(loss, np.float32)))
    if epoch % 10 == 0 or epoch == EPOCHS - 1:
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"({time.time()-t0:.0f}s)", flush=True)
train_s = time.time() - t0

acc1, mae1 = evaluate(state.params)
print(f"after {EPOCHS} epochs ({train_s:.0f}s on-chip, 3 topologies "
      f"interleaved): held-out-array ACC@10 {acc1:.3f} MAE {mae1:.2f} deg",
      flush=True)
print(f"summary: unseen-geometry ACC {acc0:.3f}->{acc1:.3f}, "
      f"MAE {mae0:.2f}->{mae1:.2f} deg, {train_s/EPOCHS:.2f} s/epoch")
