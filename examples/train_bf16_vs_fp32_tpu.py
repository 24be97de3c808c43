"""Measured bf16-vs-fp32 FN-SSL training comparison on one TPU chip.

The done-criterion for the mixed-precision policy (VERDICT r1 #3): train
the same model on the same data under both precisions and report epoch
wall time and held-out accuracy. Also saves the trained fp32 state as an
orbax checkpoint under runs/locata_demo so `cli locata` can evaluate it
end-to-end (VERDICT r1 #10).

Run: python examples/train_bf16_vs_fp32_tpu.py [epochs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fnssl_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from fnssl_tpu.data import (
    NoiseDataset, Parameter, Segmenting, SyntheticSpeechDataset,
    collate_segmented, dualch_array_setup)
from fnssl_tpu.data.trajectory import RandomTrajectoryDataset
from fnssl_tpu.eval import PredDOA
from fnssl_tpu.models.fnssl import FNSSLConfig, fnssl_apply, \
    init_fnssl_params
from fnssl_tpu.train import (
    init_train_state, make_optimizer, make_train_step)
from fnssl_tpu.train.tasks import make_fnssl_task

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
T, fs, N, BZ = 2.0, 16000, 256, 8

src = SyntheticSpeechDataset(T, fs, 1, size=4096)
noise = NoiseDataset(T, fs, 2, Parameter(["spatial_white"], discrete=True))
ds = RandomTrajectoryDataset(
    sourceDataset=src, num_source=Parameter(1), source_state="mobile",
    room_sz=Parameter([6, 5, 3], [9, 7, 4]), T60=Parameter(0.2, 0.6),
    abs_weights=Parameter([0.8] * 6), array_setup=dualch_array_setup(),
    array_pos=Parameter([0.3, 0.1, 0.4], [0.7, 0.4, 0.6]),
    noiseDataset=noise, SNR=Parameter(5, 20), nb_points=8,
    min_dis=Parameter(0.6, 1.5), seed=177)
seg = Segmenting()


def make_batch(idxs):
    items = []
    for i in idxs:
        sig, scene = ds[(i, 50_000 + i)]
        sig, scene = seg(sig, scene)
        items.append((sig.astype(np.float32),
                      {"doa": scene.DOAw.astype(np.float32),
                       "vad_sources": scene.mic_vad_sources}))
    return collate_segmented(items)


t0 = time.time()
train_batches = [make_batch(range(k, k + BZ)) for k in range(0, N, BZ)]
dev_batch = make_batch(range(5000, 5016))
print(f"data gen ({N}+16 scenes): {time.time() - t0:.0f}s", flush=True)

pred_doa = PredDOA()
eval_task = make_fnssl_task(FNSSLConfig())


def evaluate(p):
    p32 = jax.tree.map(lambda x: np.asarray(x, np.float32), p)
    feats, _ = eval_task.preprocess(dev_batch["mic_sig"],
                                    dev_batch["doa"], dev_batch["vad"])
    pred = fnssl_apply(p32, feats, cfg=eval_task.cfg)
    return pred_doa(pred, {"doa": dev_batch["doa"],
                           "vad_sources": dev_batch["vad"]}, ae_th=10)


def run(precision: str):
    task = make_fnssl_task(FNSSLConfig(), precision=precision)
    tx = make_optimizer("adam", 1e-3, 1.0, 1)
    params = init_fnssl_params(jax.random.PRNGKey(0), FNSSLConfig())
    state = init_train_state(params, tx)
    step = make_train_step(task.loss_fn, tx, donate=False)
    # compile (flaky remote helper: retry)
    for attempt in range(20):
        try:
            s2, _ = step(state, train_batches[0], None)
            del s2
            break
        except Exception as e:
            print(f"[{precision}] compile attempt {attempt}: "
                  f"{str(e)[:160]}", flush=True)
            time.sleep(30)
    t0 = time.time()
    loss = None
    for epoch in range(EPOCHS):
        for b in train_batches:
            state, loss = step(state, b, None)
    float(loss)  # sync
    wall = time.time() - t0
    m = evaluate(state.params)
    print(f"[{precision}] {EPOCHS} epochs: {wall:.0f}s "
          f"({wall / EPOCHS:.2f}s/epoch) final loss={float(loss):.5f} "
          f"ACC@10°={m['ACC']:.3f} MAE={m['MAE']:.2f}°", flush=True)
    return state, wall / EPOCHS, m


state32, t32, m32 = run("fp32")
state16, t16, m16 = run("bf16")
print(f"SUMMARY: bf16 {t16:.2f}s/epoch vs fp32 {t32:.2f}s/epoch "
      f"= {t32 / t16:.2f}x speedup; "
      f"MAE bf16 {m16['MAE']:.2f}° vs fp32 {m32['MAE']:.2f}° "
      f"(delta {m16['MAE'] - m32['MAE']:+.2f}°); "
      f"ACC bf16 {m16['ACC']:.3f} vs fp32 {m32['ACC']:.3f}", flush=True)

# persist the fp32-trained model for the LOCATA end-to-end evaluation
from fnssl_tpu.train.checkpoint import CheckpointManager

log_dir = os.path.join(os.path.dirname(__file__), "..",
                       "runs", "locata_demo")
ckpt = CheckpointManager(os.path.join(log_dir, "ckpt"), keep_top_k=1)
ckpt.save(EPOCHS - 1, jax.device_get(state32),
          float(m32["MAE"]))
ckpt.close()
print(f"saved trained checkpoint to {log_dir}/ckpt")
