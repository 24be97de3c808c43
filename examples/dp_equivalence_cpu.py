"""Multi-process data-parallel measurement (VERDICT r3 #6).

Two measurements the 4-scene e2e test doesn't make:

1. **Loss-trajectory equivalence**: 2 processes × bz 8 must train the
   same model as 1 process × bz 16 at the same seeds. The sharded
   sampler (`host_local_slice`) deals rank r the strided slice
   [r::world] of the same epoch permutation, so the union of the two
   ranks' step-s batches is exactly the single-process step-s batch;
   the psum-mean gradient is then the same global mean. Any difference
   is reduction order (fp32 noise), and this script measures it.
2. **Throughput**: wall time per epoch for both worlds at equal global
   batch. NB: this container has ONE host core — 2 processes timeshare
   it, so the 2-proc number here is a *correctness price floor*, not a
   scaling claim (scaling needs ≥1 core per rank; the collective path
   is the same either way).

Drives the REAL CLI (`cli fit --spawn 2`) on the compact fnssl corpus,
CPU platform, then diffs metrics.jsonl trajectories.

Usage: python examples/dp_equivalence_cpu.py [train_dir] [valid_dir]
           [n_scenes=128] [epochs=3] [global_bz=16]

global_bz trades memory for step count: the fp32 FN-SSL CPU step at
bz 16 peaks near 20 GB (see BASELINE.md r2 fp32 note), which OOMs when
the axon client leak of a concurrent TPU queue owns most of the host —
bz 8 (= 2 ranks x 4) halves it without changing what is measured.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRAIN = sys.argv[1] if len(sys.argv) > 1 else "/root/data_r4/fnssl/train"
VALID = sys.argv[2] if len(sys.argv) > 2 else "/root/data_r4/fnssl/dev"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 128
EPOCHS = int(sys.argv[4]) if len(sys.argv) > 4 else 3
GLOBAL_BZ = int(sys.argv[5]) if len(sys.argv) > 5 else 16


def run(name, extra):
    log_dir = f"/tmp/dp_eq/{name}"
    cmd = [sys.executable, "-m", "fnssl_tpu.cli", "fit",
           "--model", "fnssl", "--platform", "cpu",
           "--train-dir", TRAIN, "--valid-dir", VALID,
           "--train-size", str(N), "--epochs", str(EPOCHS),
           "--seed", "2", "--early-stop-patience", "0",
           "--log-dir", log_dir] + extra
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    t0 = time.time()
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       cwd=REPO)
    wall = time.time() - t0
    if r.returncode:
        print(r.stdout[-2000:], r.stderr[-2000:])
        raise SystemExit(f"{name} failed rc={r.returncode}")
    tr, va, ep_s = [], [], []
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        for line in f:
            m = json.loads(line)
            {"train/loss": tr, "valid/loss": va,
             "train/epoch_s": ep_s}.get(m["tag"], []).append(m["value"])
    return {"name": name, "wall_s": round(wall, 1),
            "epoch_s": [round(x, 2) for x in ep_s],
            "train": tr, "valid": va}


if __name__ == "__main__":
    one = run("p1", ["--bz", str(GLOBAL_BZ)])
    two = run("p2", ["--bz", str(GLOBAL_BZ // 2), "--spawn", "2"])
    dt = [abs(a - b) for a, b in zip(one["train"], two["train"])]
    dv = [abs(a - b) for a, b in zip(one["valid"], two["valid"])]
    out = {
        "n_scenes": N, "epochs": EPOCHS, "global_bz": GLOBAL_BZ,
        "p1": {k: one[k] for k in ("wall_s", "epoch_s", "train",
                                   "valid")},
        "p2x2": {k: two[k] for k in ("wall_s", "epoch_s", "train",
                                     "valid")},
        "max_abs_train_loss_delta": max(dt),
        "max_abs_valid_loss_delta": max(dv),
        "note": "single host core: the 2-proc wall time is a "
                "timesharing floor, not a scaling number",
    }
    print(json.dumps(out, indent=1))
    os.makedirs(os.path.join(REPO, "runs_r4"), exist_ok=True)
    with open(os.path.join(REPO, "runs_r4", "dp_equivalence.json"),
              "w") as f:
        json.dump(out, f, indent=1)
