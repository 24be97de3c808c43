"""VariableIPDnet at scale: 3 train topologies, unseen-geometry eval
(VERDICT r3 #2 — the r2 demo stopped at 72 scenes; this trains the
pair-mean-embedding variant on a generated multi-topology corpus and
evaluates on an unseen 3-mic geometry at the published IPDnet gates).

Corpus: compact per-scene npz per geometry (resumable — rerunning skips
existing scenes), T=4.5 s mobile 1–2-source scenes at the IPDnet stage
constants (IPDnet/Simu.py:11-70), written under <root>/geom{g} for the
train geometries and <root>/heldout for the eval geometry.

Training: one parameter set, one jitted step per topology (a new trace
per array — the VariableArrayIPDnet contract), topology-interleaved
batches, reference Adam 5e-4·0.975^epoch, bf16.

Eval: held-out scenes on the UNSEEN geometry, per-track IDL decode on
the all-pair template, Hungarian multi-track metrics at the published
vad_TH=(0.001, 0.5) (IPDnet/Module.py:582-599).

r5 (VERDICT r4 #4): same-topology utterances BATCH per step —
mic pairs ride the batch axis nb-major with per-utterance pair means
(the reference's nb·P stacking, VariableArrayIPDnet.py:107-118) — and
the unseen-geometry eval also reports the per-utterance LS-scale
normalization (PredDOAMultiTrack(scale_norm="utterance")), which makes
the published 0.5 gate array-scale-invariant.

Usage: python examples/train_variable_ipdnet_scale_tpu.py \
         [root=/root/data_r4/varipd] [n_per_geom=704] [n_test=256] \
         [epochs=12] [bz=8] [lr_gamma=0.975] [out_json=...]

lr_gamma is the PER-EPOCH decay; when bz changes the steps/epoch, pass
gamma**(old_steps/new_steps) to keep the per-STEP lr schedule identical
to a baseline run (e.g. bz=4 vs the r4 bz=1 run: 0.975**0.25=0.99369,
with 4x the epochs for an equal optimizer-step budget).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fnssl_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from fnssl_tpu.data import (ArraySetup, FixTrajectoryDataset, NoiseDataset,
                            Parameter, SyntheticSpeechDataset,
                            collate_segmented)
from fnssl_tpu.data.simu import generate
from fnssl_tpu.data.trajectory import RandomTrajectoryDataset
from fnssl_tpu.eval.pred_doa import PredDOAMultiTrack
from fnssl_tpu.models.ipdnet import (init_variable_ipdnet_params,
                                     variable_ipdnet_apply)
from fnssl_tpu.train import init_train_state, make_optimizer, make_train_step

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/root/data_r4/varipd"
N_PER_GEOM = int(sys.argv[2]) if len(sys.argv) > 2 else 704
N_TEST = int(sys.argv[3]) if len(sys.argv) > 3 else 256
EPOCHS = int(sys.argv[4]) if len(sys.argv) > 4 else 12
BZ = int(sys.argv[5]) if len(sys.argv) > 5 else 8
LR_GAMMA = float(sys.argv[6]) if len(sys.argv) > 6 else 0.975
OUT_JSON = (sys.argv[7] if len(sys.argv) > 7
            else "runs_r5/variable_ipdnet_scale.json")
T, FS = 4.5, 16000


def linear_mics(n, spacing):
    x = (np.arange(n) - (n - 1) / 2.0) * spacing
    return np.stack([x, np.zeros(n), np.zeros(n)], 1)


TRAIN_GEOMS = [linear_mics(2, 0.08), linear_mics(3, 0.06),
               linear_mics(4, 0.05)]
HELDOUT_GEOM = linear_mics(3, 0.09)          # unseen spacing AND aperture


def make_ds(mic, seed, stage):
    # IPDnet stage constants (IPDnet/Simu.py:11-70)
    snr = Parameter(-5, 15) if stage == "train" else Parameter(0, 15)
    t60 = Parameter(0.2, 1.3) if stage == "train" else Parameter(0.2, 1.0)
    setup = ArraySetup(arrayType="planar", orV=np.array([0.0, 1.0, 0.0]),
                       mic_scale=Parameter(1), mic_pos=mic.copy(),
                       mic_orV=None, mic_pattern="omni")
    return RandomTrajectoryDataset(
        sourceDataset=SyntheticSpeechDataset(T, FS, 2),
        num_source=Parameter([1, 2], discrete=True),
        source_state="mobile",
        room_sz=Parameter([6, 6, 2.5], [10, 8, 6]),
        T60=t60, abs_weights=Parameter([0.5] * 6, [1.0] * 6),
        array_setup=setup,
        array_pos=Parameter([0.1, 0.1, 0.3], [0.9, 0.5, 0.5]),
        noiseDataset=NoiseDataset(T, FS, mic.shape[0],
                                  Parameter(["spatial_white"],
                                            discrete=True)),
        SNR=snr, nb_points=50, min_dis=Parameter(0.3, 0.5), seed=seed)


t0 = time.time()
for g, mic in enumerate(TRAIN_GEOMS):
    generate(os.path.join(ROOT, f"geom{g}"), N_PER_GEOM,
             dataset=make_ds(mic, 800 + g, "train"), compact=True,
             log_every=N_PER_GEOM // 4)
generate(os.path.join(ROOT, "heldout"), N_TEST,
         dataset=make_ds(HELDOUT_GEOM, 990, "test"), compact=True,
         log_every=N_TEST // 4)
print(f"corpus ready ({3 * N_PER_GEOM}+{N_TEST} scenes, 4 geometries): "
      f"{time.time() - t0:.0f}s", flush=True)

from fnssl_tpu.train.tasks import make_variable_ipdnet_task

steps_per_epoch = 3 * (N_PER_GEOM // BZ)   # same-topology batches
tx = make_optimizer("adam", 5e-4, LR_GAMMA, steps_per_epoch)
tasks, steps, loaders = [], [], []
for g, mic in enumerate(TRAIN_GEOMS):
    task = make_variable_ipdnet_task(mic_location=mic, precision="bf16")
    tasks.append(task)
    steps.append(make_train_step(task.loss_fn, tx))
    loaders.append(FixTrajectoryDataset(os.path.join(ROOT, f"geom{g}")))
params = init_variable_ipdnet_params(jax.random.PRNGKey(0), tasks[0].cfg)
state = init_train_state(params, tx)
n_params = sum(x.size for x in jax.tree.leaves(params))
print(f"params {n_params / 1e6:.2f} M, {steps_per_epoch} steps/epoch",
      flush=True)

eval_task = make_variable_ipdnet_task(mic_location=HELDOUT_GEOM)
EVAL_NPAIR = HELDOUT_GEOM.shape[0] * (HELDOUT_GEOM.shape[0] - 1) // 2
pred_doa = PredDOAMultiTrack(HELDOUT_GEOM, max_track=2, ch_mode="MM",
                             speed=340.0)
pred_doa_norm = PredDOAMultiTrack(HELDOUT_GEOM, max_track=2,
                                  ch_mode="MM", speed=340.0,
                                  scale_norm="utterance")
test_ds = FixTrajectoryDataset(os.path.join(ROOT, "heldout"))


def batches(ds, epoch, bz=None):
    bz = BZ if bz is None else bz
    order = np.random.default_rng(1234 + epoch).permutation(len(ds))
    for s in range(0, len(order) - bz + 1, bz):  # same-topology batches
        yield collate_segmented([ds[int(i)] for i in order[s:s + bz]],
                                pad_tracks=2)


def evaluate(p, vad_gate=0.5, decoder=None):
    decoder = decoder or pred_doa
    ms = []
    for b in batches(test_ds, 0, bz=8):
        feats, _ = eval_task.preprocess(b["mic_sig"], b["doa"], b["vad"])
        pred = variable_ipdnet_apply(p, feats, cfg=eval_task.cfg,
                                     npair=EVAL_NPAIR)
        nt = min(pred.shape[1], b["doa"].shape[1])
        dec, _ = decoder.pred2doa(np.asarray(pred[:, :nt], np.float32))
        ms.append(decoder.evaluate(
            dec, {"doa": b["doa"][:, :nt], "vad_sources": b["vad"][:, :nt]},
            vad_th=(0.001, vad_gate)))
    return {k: round(float(np.mean([np.ravel(m[k])[0] for m in ms])), 4)
            for k in ms[0]}


history = []
t0 = time.time()
for epoch in range(EPOCHS):
    its = [batches(loaders[g], epoch) for g in range(3)]
    order = sum(([g] * (N_PER_GEOM // BZ) for g in range(3)), [])
    np.random.default_rng(epoch).shuffle(order)
    losses = []
    te = time.time()
    for g in order:
        state, loss = steps[g](state, next(its[g]), None)
        losses.append(loss)        # device scalar — fetch ONCE at epoch
    import jax.numpy as jnp       # end (a per-step fetch would serialize
    tr = float(np.mean(np.asarray(  # the pipeline on the tunnel, r2)
        jax.device_get(jnp.stack(losses)), np.float32)))
    history.append({"epoch": epoch, "train": tr,
                    "epoch_s": round(time.time() - te, 1)})
    print(json.dumps(history[-1]), flush=True)
train_s = time.time() - t0

m05 = evaluate(state.params, 0.5)
m03 = evaluate(state.params, 0.3)
m05n = evaluate(state.params, 0.5, decoder=pred_doa_norm)
m03n = evaluate(state.params, 0.3, decoder=pred_doa_norm)
out = {"n_per_geom": N_PER_GEOM, "n_test": N_TEST, "epochs": EPOCHS,
       "bz": BZ, "lr_gamma": LR_GAMMA, "train_s": round(train_s, 1),
       "heldout_gate05": m05, "heldout_gate03": m03,
       "heldout_gate05_scalenorm": m05n, "heldout_gate03_scalenorm": m03n,
       "history": history}
print(json.dumps({"heldout_gate05": m05, "heldout_gate03": m03,
                  "heldout_gate05_scalenorm": m05n,
                  "heldout_gate03_scalenorm": m03n,
                  "train_s": round(train_s, 1)}), flush=True)
os.makedirs(os.path.dirname(OUT_JSON) or ".", exist_ok=True)
with open(OUT_JSON, "w") as f:
    json.dump(out, f, indent=1)
