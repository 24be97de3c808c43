"""Kept-frame agreement sweep: C++ GMM VAD vs energy ladder (VERDICT r2 #8)."""
import sys
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import numpy as np
from fnssl_tpu.data.vad import gmm_frame_vad, frame_vad
from fnssl_tpu.sim import beta_sabine_estimation, t2n, simulate_rir, simulate_trajectory

FS = 16000

def speechlike(dur, f0=120.0, level=0.3, seed=0):
    t = np.arange(int(dur * FS)) / FS
    f0t = f0 * (1 + 0.08 * np.sin(2 * np.pi * 2.3 * t))
    phase = 2 * np.pi * np.cumsum(f0t) / FS
    sig = np.zeros_like(t)
    for h, a in [(1,1.0),(2,0.8),(3,0.9),(4,0.5),(5,0.6),(6,0.3),(8,0.4),(12,0.2),(20,0.15)]:
        sig += a * np.sin(h * phase)
    am = 0.5 * (1 + np.sin(2 * np.pi * 4.0 * t - np.pi / 2))
    return (level * am * sig / np.max(np.abs(sig))).astype(np.float32)

def make_utt(seed):
    rng = np.random.default_rng(seed)
    floor = lambda d: (3e-4 * rng.standard_normal(int(d * FS))).astype(np.float32)
    return np.concatenate([floor(0.4), speechlike(1.2, f0=100+20*(seed%5)), floor(0.6),
                           speechlike(0.8, f0=140+15*(seed%3)), floor(0.4)])

def add_noise(sig, snr_db, rng):
    n = rng.standard_normal(len(sig)).astype(np.float32)
    ps = np.mean(sig**2); pn = np.mean(n**2)
    n *= np.sqrt(ps / pn / 10**(snr_db/10))
    return sig + n

def reverberate(sig, t60, seed):
    room = np.array([6.0, 5.0, 3.0])
    beta = beta_sabine_estimation(room, t60)
    mics = np.array([[3.0, 2.5, 1.5]])
    traj = np.array([[1.5, 1.5, 1.5]])
    n = t2n(t60, room)
    rirs = simulate_rir(room, beta, traj, mics, n, t60, FS)
    out = simulate_trajectory(sig, rirs, timestamps=np.array([0.0]), fs=FS)[:, 0]
    out = out[:len(sig)]
    return (out / (np.max(np.abs(out)) + 1e-9) * np.max(np.abs(sig))).astype(np.float32)

def agreement(sig):
    g = gmm_frame_vad(sig, FS, 3)
    e = frame_vad(sig, FS, 3)
    n = min(len(g), len(e))
    g, e = g[:n] > 0, e[:n] > 0
    agree = float(np.mean(g == e))
    kept_g, kept_e = float(g.mean()), float(e.mean())
    both = g & e
    return agree, kept_g, kept_e, float(both.sum()/max(g.sum(),1)), float(both.sum()/max(e.sum(),1))

conds = []
rng = np.random.default_rng(7)
N = 8
for name, xform in [
    ("clean", lambda s, i: s),
    ("noisy SNR 20 dB", lambda s, i: add_noise(s, 20, np.random.default_rng(100+i))),
    ("noisy SNR 10 dB", lambda s, i: add_noise(s, 10, np.random.default_rng(200+i))),
    ("noisy SNR 0 dB",  lambda s, i: add_noise(s, 0,  np.random.default_rng(300+i))),
    ("reverb T60 0.4 s", lambda s, i: reverberate(s, 0.4, i)),
    ("reverb T60 0.8 s", lambda s, i: reverberate(s, 0.8, i)),
    ("reverb 0.6 s + SNR 10 dB", lambda s, i: add_noise(reverberate(s, 0.6, i), 10, np.random.default_rng(400+i))),
]:
    rows = [agreement(xform(make_utt(i), i)) for i in range(N)]
    rows = np.array(rows)
    m = rows.mean(axis=0)
    conds.append((name, m))
    print(f"{name:28s} agree {m[0]:.3f}  kept(gmm) {m[1]:.3f}  kept(energy) {m[2]:.3f}  "
          f"P(e|g) {m[3]:.3f}  P(g|e) {m[4]:.3f}")

print("\n-- after the clean_silences ladder (the deployment path) --")
from fnssl_tpu.data.vad import clean_silences
for name, xform in [
    ("clean", lambda s, i: s),
    ("noisy SNR 20 dB", lambda s, i: add_noise(s, 20, np.random.default_rng(100+i))),
    ("noisy SNR 10 dB", lambda s, i: add_noise(s, 10, np.random.default_rng(200+i))),
    ("noisy SNR 0 dB",  lambda s, i: add_noise(s, 0,  np.random.default_rng(300+i))),
    ("reverb T60 0.4 s", lambda s, i: reverberate(s, 0.4, i)),
    ("reverb T60 0.8 s", lambda s, i: reverberate(s, 0.8, i)),
    ("reverb 0.6 s + SNR 10 dB", lambda s, i: add_noise(reverberate(s, 0.6, i), 10, np.random.default_rng(400+i))),
]:
    rows = []
    for i in range(N):
        s = xform(make_utt(i), i)
        _, vg = clean_silences(s, FS, method="gmm")
        _, ve = clean_silences(s, FS, method="energy")
        n = min(len(vg), len(ve)); g, e = vg[:n] > 0, ve[:n] > 0
        rows.append((float(np.mean(g == e)), float(g.mean()), float(e.mean())))
    m = np.array(rows).mean(axis=0)
    print(f"{name:28s} agree {m[0]:.3f}  kept(gmm-ladder) {m[1]:.3f}  kept(energy-ladder) {m[2]:.3f}")
