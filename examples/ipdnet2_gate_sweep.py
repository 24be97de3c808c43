"""IPDnet2 est-VAD operating-point study (VERDICT r3 #3).

The r3 scale eval recorded FAR=0.192 at the published 0.5 gate — 2.4×
the IPDnet family's 0.081 — without explaining it. This script closes
that: one forward pass over the held-out RealMAN test split caches the
model's track IPDs, then BOTH decode variants are swept across their
gates on the cached outputs:

  * LS-scale VAD (IDL decode, the IPDnet-family score: larger = more
    confident, `vad_est > gate`) — what `cli test` ships;
  * the reference IPDnet2 MSE-distance decode (IPDnet2/Module.py:
    596-655): detection score = min MSE / 0.2919 with the *inverted*
    comparator `vad_est < gate` (Module.py:167,683).

Output: one JSON line per (decode, gate) with ACC/MDR/FAR/MAE — the
table that says which operating point the near-field family should
publish, and whether the r3 FAR was a gate artifact or a decode-variant
mismatch.

Usage:
  python examples/ipdnet2_gate_sweep.py --log-dir runs_r4/ipdnet2_realman \
      --data-dir /root/data_r4/realman/test/ma_speech/ \
      --csv /root/data_r4/realman/test/targets.csv \
      --noise /root/data_r4/realman/noise [--out sweep.json]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-dir", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--csv", required=True)
    ap.add_argument("--noise", required=True)
    ap.add_argument("--ext", default="wav")
    ap.add_argument("--bz", type=int, default=16)
    ap.add_argument("--seed", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from fnssl_tpu.data import DataLoader, RealData, collate_realman
    from fnssl_tpu.eval import PredDOAMultiTrack
    from fnssl_tpu.eval.decode import mse_decode
    from fnssl_tpu.eval.metrics import get_metric_multiple
    from fnssl_tpu.models.spatialnet import spatialnet_apply
    from fnssl_tpu.parallel import host_local_slice
    from fnssl_tpu.train.learner import Learner
    from fnssl_tpu.train.tasks import make_ipdnet2_task

    task = make_ipdnet2_task()
    from fnssl_tpu.models.spatialnet import init_spatialnet_params
    params = init_spatialnet_params(jax.random.PRNGKey(args.seed),
                                    task.cfg)
    learner = Learner(task.loss_fn, params, optimizer="adamw",
                      grad_clip=5.0, log_dir=args.log_dir,
                      seed=args.seed)
    epoch = learner.resume(best=True)
    if epoch == 0:
        raise SystemExit(f"no checkpoint under {args.log_dir}")
    params = learner.state.params
    print(f"restored best checkpoint (epoch {epoch})", flush=True)

    ds = RealData(args.data_dir, [args.csv], args.noise,
                  use_mic_id=[0, 1, 3, 5, 7], max_source=2,
                  ext=args.ext)
    sched = host_local_slice(len(ds), 0, seed=args.seed, shuffle=False)
    batches = DataLoader(lambda item: ds[item], sched, args.bz,
                         collate_realman, num_workers=2, prefetch=2)

    mt = PredDOAMultiTrack(task.dpipd.mic_location, max_track=2)
    fwd = jax.jit(lambda p, x: spatialnet_apply(p, x, cfg=task.cfg))

    # one forward pass; cache decoded (doa_est, vad) per decode variant
    ls_doa, ls_vad, mse_doa, mse_vad = [], [], [], []
    gt_doa, gt_vad = [], []
    for bi, batch in enumerate(batches):
        feats, _ = task.preprocess(batch["mic_sig"], batch["azi_deg"],
                                   batch["distance"], batch["vad"],
                                   batch["mic_pos"])
        pred = np.asarray(fwd(params, feats), np.float32)
        nt = min(pred.shape[1], batch["azi_deg"].shape[1])
        pred = pred[:, :nt]
        azi = np.asarray(batch["azi_deg"])[:, :nt]
        gt_doa.append(np.radians(np.stack(
            [np.full_like(azi, 90.0), azi], axis=2)))
        gt_vad.append(np.asarray(batch["vad"])[:, :nt])
        dec, _ = mt.pred2doa(pred)                  # LS-scale (IDL)
        ls_doa.append(np.asarray(dec["doa"]))
        ls_vad.append(np.asarray(dec["vad_sources"]))
        md, mv = [], []
        for track in range(2):                      # reference MSE decode
            res = mse_decode(pred[..., track], mt.template,
                             mt.ele_candidate, mt.azi_candidate,
                             max_num_sources=1, source_num_mode="unkNum")
            md.append(np.asarray(res.doa[..., 0]))
            mv.append(np.asarray(res.vad[..., 0]))
        mse_doa.append(np.stack(md, axis=-1))
        # the reference divides the MSE score by 0.2919
        # (IPDnet2/Module.py:683) before the inverted comparison
        mse_vad.append(np.stack(mv, axis=-1) / 0.2919)
        print(f"batch {bi} decoded", flush=True)

    def cat(x):
        return np.concatenate(x, axis=0)
    gt = {"doa": np.degrees(cat(gt_doa)), "vad": cat(gt_vad)}

    rows = []
    for name, doa, vad, invert, gates in (
            ("ls_idl", cat(ls_doa), cat(ls_vad), False,
             (0.3, 0.4, 0.5, 0.6, 0.7)),
            ("mse_ref", cat(mse_doa), cat(mse_vad), True,
             (0.3, 0.5, 0.7, 1.0, 1.5))):
        doa_deg = np.degrees(doa)
        for gate in gates:
            m = get_metric_multiple(
                gt["doa"], gt["vad"], doa_deg, vad,
                ae_mode=("azi",), ae_th=10.0,
                vad_th=(0.001, gate), invert_est_vad=invert)
            row = {"decode": name, "gate": gate,
                   **{k: round(float(v), 4) for k, v in m.items()}}
            rows.append(row)
            print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"epoch": epoch, "rows": rows}, f, indent=1)
    learner.close()


if __name__ == "__main__":
    main()
