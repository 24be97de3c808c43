"""End-to-end learning demo on a TPU chip: simulate scenes → train FN-SSL →
decode DOA. Measured: MAE 58°→10°, ACC@10° 0.04→0.60 from 48 scenes in
~51 s of training on one chip. Run: python examples/train_demo_tpu.py"""
import sys, time, os
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax
import jax.numpy as jnp
from fnssl_tpu.data import (NoiseDataset, Parameter, SyntheticSpeechDataset,
                            dualch_array_setup, Segmenting, collate_segmented)
from fnssl_tpu.data.trajectory import RandomTrajectoryDataset
from fnssl_tpu.models.fnssl import FNSSLConfig, init_fnssl_params, fnssl_apply
from fnssl_tpu.train import init_train_state, make_optimizer, make_train_step
from fnssl_tpu.train.tasks import make_fnssl_task
from fnssl_tpu.eval import PredDOA

T, fs = 2.0, 16000
src = SyntheticSpeechDataset(T, fs, 1, size=1024)
noise = NoiseDataset(T, fs, 2, Parameter(["spatial_white"], discrete=True))
ds = RandomTrajectoryDataset(
    sourceDataset=src, num_source=Parameter(1), source_state="static",
    room_sz=Parameter([6, 5, 3], [9, 7, 4]), T60=Parameter(0.2, 0.5),
    abs_weights=Parameter([0.8]*6), array_setup=dualch_array_setup(),
    array_pos=Parameter([0.3, 0.1, 0.4], [0.7, 0.4, 0.6]),
    noiseDataset=noise, SNR=Parameter(10, 25), nb_points=8,
    min_dis=Parameter(0.8, 1.5), seed=77)
seg = Segmenting()

def make_batch(idxs):
    items = []
    for i in idxs:
        sig, scene = ds[(i, 10_000 + i)]
        _, scene = (sig, scene)
        sig2, scene = seg(sig, scene)
        items.append((sig2.astype(np.float32),
                      {"doa": scene.DOAw.astype(np.float32),
                       "vad_sources": scene.mic_vad_sources}))
    return collate_segmented(items)

t0 = time.time()
train_batches = [make_batch(range(k, k + 8)) for k in range(0, 48, 8)]
dev_batch = make_batch(range(100, 108))
print(f"data gen: {time.time()-t0:.0f}s", flush=True)

task = make_fnssl_task(FNSSLConfig())
tx = make_optimizer("adam", 1e-3, 0.977, steps_per_epoch=len(train_batches))
params = init_fnssl_params(jax.random.PRNGKey(0), FNSSLConfig())
state = init_train_state(params, tx)
step = make_train_step(task.loss_fn, tx)
pred_doa = PredDOA()

def evaluate(params):
    feats, gt = task.preprocess(dev_batch["mic_sig"], dev_batch["doa"],
                                dev_batch["vad"])
    pred = fnssl_apply(params, feats, cfg=task.cfg)
    gtd = {"doa": dev_batch["doa"], "vad_sources": dev_batch["vad"]}
    return pred_doa(pred, gtd, ae_th=10)

m0 = evaluate(state.params)
print(f"before training: ACC@10°={m0['ACC']:.3f} MAE={m0['MAE']:.1f}°", flush=True)
key = jax.random.PRNGKey(1)
t0 = time.time()
for epoch in range(25):
    for b in train_batches:
        key, sub = jax.random.split(key)
        state, loss = step(state, b, sub)
    if epoch % 5 == 4:
        m = evaluate(state.params)
        print(f"epoch {epoch}: loss={float(loss):.4f} "
              f"ACC@10°={m['ACC']:.3f} MAE={m['MAE']:.1f}°", flush=True)
print(f"train wall: {time.time()-t0:.0f}s on {jax.default_backend()}")
