"""Reference torch FN-SSL TRAIN step (data_preprocess + fwd + mse + bwd +
Adam) on the container CPU — the vs_baseline_train denominator (VERDICT r2 #4).
Methodology matches bench.py's train section: bz 16 x 4.79 s @16 kHz,
T-F frames = nb*nt*nf with nt=298, nf=256. torch 1 thread (1-core host)."""
import sys, time
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import numpy as np
import torch
torch.set_num_threads(1)
from tests.reference_oracle import load_reference_module

learner_mod = load_reference_module(
    "FN-SSL/Learner.py", "ref_learner",
    extra_sys_path="/root/reference/FN-SSL",
    stub_modules=("webrtcvad", "soundfile", "gpuRIR"))
model_mod = load_reference_module(
    "FN-SSL/Model.py", "ref_model", extra_sys_path="/root/reference/FN-SSL")

mic_pos = np.array([[-0.04, 0.0, 0.0], [0.04, 0.0, 0.0]])
net = model_mod.FN_SSL()
learner = learner_mod.SourceTrackingFromSTFTLearner(
    net, win_len=512, win_shift_ratio=0.5, nfft=512, fre_used_ratio=1,
    nele=37, nazi=73, rn=mic_pos, fs=16000, ch_mode="MM",
    tar_useVAD=True, localize_mode=("IDL", "unkNum", 2))
learner.cpu()
opt = torch.optim.Adam(net.parameters(), lr=1e-3)

def one_step(nb):
    rng = np.random.default_rng(0)
    mic = torch.from_numpy(rng.standard_normal((nb, 76640, 2)).astype(np.float32))
    nseg = 24
    doa = np.stack([np.full((nb, nseg, 1), np.pi / 2),
                    rng.uniform(0, np.pi, (nb, nseg, 1))], axis=2)
    gt = {"doa": torch.from_numpy(doa.astype(np.float32)),
          "vad_sources": torch.from_numpy(np.ones((nb, nseg, 12, 1), np.float32))}
    t0 = time.perf_counter()
    in_batch, gt_b = learner.data_preprocess(mic, gt)
    in_batch.requires_grad_()
    pred = net(in_batch)
    loss = learner.mse_loss(pred_batch=pred, gt_batch=gt_b)
    loss.backward()
    opt.step(); opt.zero_grad()
    return time.perf_counter() - t0, float(loss)

for nb in (2, 16):
    dt, loss = one_step(nb)
    frames = nb * 298 * 256
    print(f"bz {nb}: {dt:.1f} s/step = {frames/dt:.0f} T-F frames/s (loss {loss:.4f})", flush=True)
