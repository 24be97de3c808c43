"""Command-line entry points: simulate / fit / test / predict.

Mirrors the reference's two harnesses (SURVEY.md §2.7): the raw-torch
scripts (Train.py / Predict.py / Simu.py with the ``opt`` argparse class,
FN-SSL/Opt.py:9-80) and the LightningCLI fit/test subcommands
(Lightning/main.py:282-371). One typed argparse tree + optional YAML
config file; every run snapshots its resolved config (the
MySaveConfigCallback behavior) and git/pip provenance.

Usage:
  python -m fnssl_tpu.cli simulate --out data/train --num 64
  python -m fnssl_tpu.cli fit --model fnssl --train-dir data/train \
      --valid-dir data/dev --epochs 3 --bz 4 --log-dir runs/fnssl
  python -m fnssl_tpu.cli test --model fnssl --data-dir data/test \
      --log-dir runs/fnssl
  python -m fnssl_tpu.cli predict --model fnssl --wav x.wav \
      --log-dir runs/fnssl --out results/
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _add_common(p):
    p.add_argument("--model", default="fnssl",
                   choices=["fnssl", "fnssl_doa", "ipdnet",
                            "ipdnet_offline", "variable_ipdnet",
                            "ipdnet2", "ipd_baseline"])
    p.add_argument("--log-dir", default="runs/default")
    p.add_argument("--config", default=None,
                   help="YAML file of argument defaults")
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--bz", type=int, default=4)
    p.add_argument("--use-mesh", action="store_true",
                   help="shard batches over all local devices (DP)")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="jax.distributed coordinator address for "
                        "multi-process DP (the reference's DDP launch, "
                        "Lightning/main.py:286-288); rank 0 hosts it")
    p.add_argument("--num-processes", type=int, default=None,
                   help="world size for multi-process DP; every process "
                        "runs this same command with its own --process-id "
                        "(per-process --bz, global batch = bz × world)")
    p.add_argument("--process-id", type=int, default=None,
                   help="this process's rank in [0, num-processes)")
    p.add_argument("--platform", default="default",
                   choices=["default", "cpu", "tpu"],
                   help="force the jax platform (cpu = run/simulate "
                        "without the TPU, e.g. multi-process DP smoke "
                        "with XLA_FLAGS device-count override)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax debug_nans (SURVEY §5.2 equivalent)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the model in the backward pass "
                        "(less memory, smaller compiled program)")
    p.add_argument("--precision", default="fp32",
                   choices=["fp32", "bf16"],
                   help="compute precision policy: bf16 = mixed precision "
                        "(params fp32, model compute bf16, loss/grads "
                        "fp32 — the reference's AMP, Learner.py:109-115)")
    p.add_argument("--workers", type=int, default=2,
                   help="batch-assembly threads (0 = serial); the "
                        "DataLoader num_workers analogue, Train.py:94-101")
    p.add_argument("--prefetch", type=int, default=2,
                   help="batches kept in flight ahead of the train step")
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture a jax.profiler device trace of the "
                        "first N epochs into <log-dir>/profile "
                        "(TensorBoard/Perfetto-viewable; the reference "
                        "only reports FLOPs, SURVEY §5.1)")


def build_parser():
    ap = argparse.ArgumentParser("fnssl_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("simulate", help="generate wav+npz dataset")
    p.add_argument("--out", required=True)
    p.add_argument("--num", type=int, default=16)
    p.add_argument("--T", type=float, default=4.79)
    p.add_argument("--num-source", type=int, default=1)
    p.add_argument("--nb-points", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--librispeech", default=None,
                   help="LibriSpeech root (synthetic sources if omitted)")
    p.add_argument("--preset", default="fnssl",
                   choices=["fnssl", "ipdnet"],
                   help="simulation stage constants (Simu.py variants)")
    p.add_argument("--stage", default="train",
                   choices=["train", "dev", "test"])
    p.add_argument("--compact", action="store_true",
                   help="write compact per-scene npz (int16 mic + "
                        "segmented labels, ~0.3 MB/scene) instead of the "
                        "wav+pickle contract (~8 MB/scene); both are "
                        "read transparently by fit/test")

    p = sub.add_parser("fit", help="train a model")
    _add_common(p)
    p.add_argument("--train-dir", required=True,
                   help="wav+npz dir, or RealMAN ma_speech dir for ipdnet2")
    p.add_argument("--valid-dir", required=True)
    p.add_argument("--train-size", type=int, default=None,
                   help="use only the first N scenes of --train-dir "
                        "(numeric filename order) — scaling-curve runs "
                        "train nested subsets of one corpus")
    p.add_argument("--spawn", type=int, default=None, metavar="N",
                   help="launch the whole N-process DP world from this "
                        "one command (the Lightning auto-spawn analogue, "
                        "Lightning/main.py:286-288): re-runs this same "
                        "fit N times with --coordinator/--num-processes/"
                        "--process-id filled in; rank 0 prints here, "
                        "other ranks log to <log-dir>/rankK.spawn.log")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--lr-gamma", type=float, default=None,
                   help="per-epoch exponential lr decay override (torch "
                        "ExponentialLR gamma). Needed when the epoch "
                        "GRID differs from the reference recipe at equal "
                        "step budget: decay-per-STEP is what transfers, "
                        "so a 640×32-step run matching a 10×2048-step "
                        "recipe wants gamma^(32/2048)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--early-stop-patience", type=int, default=10,
                   help="epochs without valid/loss improvement before "
                        "stopping (Lightning/main.py:290-296); 0 disables")
    p.add_argument("--rss-restart-gb", type=float, default=None,
                   help="checkpoint + re-exec (with --resume) when host "
                        "RSS exceeds this at an epoch boundary; default "
                        "auto = 70%% of MemTotal, 0 disables. Bounds the "
                        "axon client's per-transfer host-memory leak on "
                        "long file-backed runs")
    p.add_argument("--stall-restart-s", type=float, default=None,
                   help="re-exec (with --resume) if no training step "
                        "completes for this many seconds — recovers from "
                        "a wedged TPU-client tunnel, which blocks every "
                        "device call uncancellably. 0 disables; pick a "
                        "value above the worst first-step compile "
                        "(~600 s observed). Default: off")
    p.add_argument("--early-stop-min-delta", type=float, default=0.01)
    p.add_argument("--valid-every", type=int, default=1,
                   help="validate + checkpoint every N epochs (final / "
                        "interrupted / rss-stop epochs always validate) — "
                        "for many-tiny-epoch regimes, e.g. fixed-step-"
                        "budget runs on small corpora")
    p.add_argument("--realman-csv", default=None,
                   help="RealMAN targets CSV (ipdnet2)")
    p.add_argument("--realman-valid-csv", default=None,
                   help="targets CSV for --valid-dir (each RealMAN "
                        "split carries its own CSV; defaults to "
                        "--realman-csv)")
    p.add_argument("--realman-noise", default=None,
                   help="RealMAN noise dir (ipdnet2)")
    p.add_argument("--realman-ext", default="flac")
    p.add_argument("--realman-cache", default=None, metavar="DIR",
                   help="decoded-sample cache dir: first epoch decodes "
                        "each audio file once into .npy, later epochs "
                        "mmap (same per-item-seed mixing bit-for-bit; "
                        "cuts the 8x loader-bound floor measured in "
                        "BASELINE.md r4)")
    p.add_argument("--mic-ids", default="0,1,3,5,7",
                   help="RealMAN mic subset (ipdnet2)")

    p = sub.add_parser("test", help="evaluate a checkpoint")
    _add_common(p)
    p.add_argument("--data-dir", required=True,
                   help="wav+npz dir, or RealMAN ma_speech dir for "
                        "ipdnet2 (with --realman-csv)")
    p.add_argument("--best", action="store_true",
                   help="evaluate the best-valid-loss checkpoint instead "
                        "of the latest (the reference's best_model.tar)")
    p.add_argument("--realman-csv", default=None,
                   help="RealMAN targets CSV (ipdnet2)")
    p.add_argument("--realman-noise", default=None,
                   help="RealMAN noise dir (ipdnet2)")
    p.add_argument("--realman-ext", default="flac")
    p.add_argument("--realman-cache", default=None, metavar="DIR",
                   help="decoded-sample cache dir: first epoch decodes "
                        "each audio file once into .npy, later epochs "
                        "mmap (same per-item-seed mixing bit-for-bit; "
                        "cuts the 8x loader-bound floor measured in "
                        "BASELINE.md r4)")
    p.add_argument("--mic-ids", default="0,1,3,5,7",
                   help="RealMAN mic subset (ipdnet2)")

    p = sub.add_parser("predict", help="DOA prediction for a wav file")
    _add_common(p)
    p.add_argument("--wav", required=True)
    p.add_argument("--out", default="results/")

    p = sub.add_parser("stream", help="real-time chunked DOA from a wav "
                       "(the runIPDnetOn causal serving mode as a CLI)")
    _add_common(p)
    p.add_argument("--wav", required=True)
    p.add_argument("--chunk-ms", type=float, default=192.0,
                   help="audio push size; outputs fire per 12 buffered "
                        "STFT frames regardless of push size")
    p.add_argument("--out", default=None,
                   help="directory for doa_est.npy / vad_est.npy dumps")
    p.add_argument("--artifact", default=None,
                   help="serve from a `cli export --mode stream` "
                        "artifact instead of a checkpoint (no model "
                        "code runs — the StableHLO chunk step is the "
                        "model)")

    p = sub.add_parser("serve", help="TCP streaming-localization "
                       "service: raw PCM in, per-block DOA/VAD JSON out "
                       "(one independent model stream per connection)")
    _add_common(p)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7316)
    p.add_argument("--artifact", default=None,
                   help="serve an exported `--mode stream` artifact "
                        "instead of a checkpoint")
    p.add_argument("--nch", type=int, default=None,
                   help="channels per connection (default: the model's "
                        "native count — 2 for fnssl/ipdnet, the mic "
                        "subset size for ipdnet2)")
    p.add_argument("--slots", type=int, default=0,
                   help="slot-batched execution: up to N concurrent "
                        "streams ride ONE static-shape device program "
                        "(masked per-slot state reset/carry, "
                        "runtime/slots.py — 16 batched streams measured "
                        "at ~the wall cost of one). 0 = one chunk step "
                        "per connection")

    p = sub.add_parser("export", help="serialize a trained model to a "
                       "hermetic serving artifact (StableHLO + weights; "
                       "loadable with runtime.export.load_artifact, no "
                       "model code needed)")
    _add_common(p)
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--best", action="store_true",
                   help="export the best checkpoint instead of the last")
    p.add_argument("--mode", choices=["forward", "stream"],
                   default="forward")
    p.add_argument("--platforms", default=None,
                   help="comma list (e.g. cpu,tpu) to cross-lower; "
                        "default: current backend (keeps the Pallas "
                        "LSTM kernel on TPU)")
    p.add_argument("--export-bz", type=int, default=1)
    p.add_argument("--export-t", type=int, default=None,
                   help="frames: forward default 298 (4.79 s), stream "
                        "default = the model chunk size")

    p = sub.add_parser("locata", help="evaluate on LOCATA recordings")
    _add_common(p)
    p.add_argument("--locata-dir", required=True)
    p.add_argument("--tasks", default="3,5")
    p.add_argument("--array", default="dicit")
    p.add_argument("--mic-pick", default="8,5",
                   help="2-mic channel pick (Learner.py:245)")
    p.add_argument("--out", default="locata_result/")
    p.add_argument("--ae-th", type=float, default=30.0)
    p.add_argument("--plot", action="store_true")
    return ap


def _apply_yaml_defaults(ap, args):
    if getattr(args, "config", None):
        import yaml
        with open(args.config) as f:
            for k, v in (yaml.safe_load(f) or {}).items():
                if getattr(args, k, None) in (None, ap.get_default(k)):
                    setattr(args, k, v)
    return args


def _init_runtime(args):
    """Platform override + multi-process DP initialization. Must run
    before anything touches jax devices. Multi-process implies the
    mesh path (batches sharded over the global data axis; each process
    feeds its host_local_slice share)."""
    import jax

    # Persistent compilation cache: a remote-device compile costs tens
    # of seconds to tens of minutes per program over the tunnel; every
    # restart (--resume re-execs, rss/stall self-healing, repeated
    # fit/test of the same shapes) reuses it instead of re-paying.
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/fnssl_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if getattr(args, "platform", "default") != "default":
        jax.config.update("jax_platforms", args.platform)
    world = getattr(args, "num_processes", None)
    if world and world > 1:
        from fnssl_tpu.parallel.distributed import initialize
        if args.process_id is None or args.coordinator is None:
            raise SystemExit("multi-process DP needs --coordinator and "
                             "--process-id")
        initialize(args.coordinator, world, args.process_id)
        args.use_mesh = True


def _make_task(name: str, args=None):
    from fnssl_tpu.models.fnssl import FNSSLConfig
    from fnssl_tpu.train import tasks

    remat = bool(getattr(args, "remat", False)) if args else False
    precision = getattr(args, "precision", "fp32") if args else "fp32"
    pol = {"remat": remat, "precision": precision}
    if name == "fnssl":
        return tasks.make_fnssl_task(FNSSLConfig(), **pol)
    if name == "fnssl_doa":
        return tasks.make_fnssl_task(FNSSLConfig(is_doa=True), **pol)
    if name == "ipdnet":
        return tasks.make_ipdnet_task(**pol)
    if name == "ipdnet_offline":
        # bidirectional narrow LSTMs + global magnitude norm
        # (runIPDnetOff.py:79-303); test-time uses chunked offline
        # inference via models/ipdnet.py's chunk path
        return tasks.make_ipdnet_offline_task(**pol)
    if name == "variable_ipdnet":
        return tasks.make_variable_ipdnet_task(**pol)
    if name == "ipdnet2":
        mic = None
        if args is not None and getattr(args, "mic_ids", None):
            from fnssl_tpu.data.arrays import audiowu_high_array_geometry
            ids = [int(i) for i in args.mic_ids.split(",")]
            mic = audiowu_high_array_geometry()[ids]
        return tasks.make_ipdnet2_task(mic_location=mic, **pol)
    if name == "ipd_baseline":
        raise SystemExit("ipd_baseline is model-free (no training); "
                         "use `cli predict --model ipd_baseline`")
    raise SystemExit(f"model {name!r} has no CLI task wiring yet")


def _restore_learner(args, task, model: str, metric_fn=None,
                     best: bool = False):
    """Build a Learner whose optimizer-state STRUCTURE matches what
    cmd_fit checkpointed for this model (ipdnet2 = AdamW + grad-clip —
    a different opt_state pytree than plain Adam, so orbax restore
    rejects a default-optimizer Learner), then restore. Returns
    (learner, epoch)."""
    from fnssl_tpu.train.learner import Learner

    params = _init_params(model, task, args.seed)
    learner = Learner(
        task.loss_fn, params,
        optimizer="adamw" if model == "ipdnet2" else "adam",
        grad_clip=5.0 if model == "ipdnet2" else None,
        log_dir=args.log_dir, metric_fn=metric_fn, seed=args.seed)
    epoch = learner.resume(best=best)
    return learner, epoch


def _init_params(name: str, task, seed: int):
    import jax

    key = jax.random.PRNGKey(seed)
    if name.startswith("fnssl"):
        from fnssl_tpu.models.fnssl import init_fnssl_params
        return init_fnssl_params(key, task.cfg)
    if name in ("ipdnet", "ipdnet_offline"):
        from fnssl_tpu.models.ipdnet import init_ipdnet_params
        return init_ipdnet_params(key, task.cfg)
    if name == "variable_ipdnet":
        from fnssl_tpu.models.ipdnet import init_variable_ipdnet_params
        return init_variable_ipdnet_params(key, task.cfg)
    if name == "ipdnet2":
        from fnssl_tpu.models.spatialnet import init_spatialnet_params
        return init_spatialnet_params(key, task.cfg)
    raise SystemExit(name)


def _eval_schedule(sched, bz: int, static_shapes: bool):
    """Eval must never silently lose samples (reference eval iterates the
    whole split; drop_last is a TRAIN contract). Two regimes:

    - dynamic shapes (single process, no mesh): keep the ragged final
      batch — ``eval_epoch`` weights per batch, one extra jit trace.
    - static shapes (multi-process world / device mesh): a ragged local
      batch cannot assemble into the fixed global array, so wrap-pad the
      schedule to a bz multiple (DistributedSampler semantics — the
      duplicates are deterministic and identical-length on every rank).
      Returns (schedule, drop_last).
    """
    if not static_shapes:
        return sched, False
    if sched and len(sched) % bz:
        import itertools
        target = -(-len(sched) // bz) * bz
        sched = list(itertools.islice(itertools.cycle(sched), target))
    return sched, True


def _static_shapes(args) -> bool:
    import jax
    return (getattr(args, "use_mesh", False)
            or (getattr(args, "num_processes", None) or 1) > 1
            or jax.process_count() > 1)


def _realman_batches(args, bz: int, epoch: int, seed: int,
                     shuffle: bool, data_dir: str | None = None,
                     csv: str | None = None):
    """RealMAN on-the-fly batches for the ipdnet2 task (prefetched)."""
    from fnssl_tpu.data import DataLoader, RealData, collate_realman
    from fnssl_tpu.parallel import host_local_slice

    mic_ids = [int(i) for i in args.mic_ids.split(",")]
    ds = RealData(data_dir or args.train_dir, [csv or args.realman_csv],
                  args.realman_noise,
                  use_mic_id=mic_ids, max_source=2, ext=args.realman_ext,
                  cache_dir=getattr(args, "realman_cache", None))
    sched = host_local_slice(len(ds), epoch, seed=seed, shuffle=shuffle)
    drop_last = True
    if not shuffle:
        sched, drop_last = _eval_schedule(sched, bz, _static_shapes(args))
    return DataLoader(lambda item: ds[item], sched, bz, collate_realman,
                      num_workers=getattr(args, "workers", 2),
                      prefetch=getattr(args, "prefetch", 2),
                      drop_last=drop_last)


def _batches(data_dir: str, bz: int, epoch: int, seed: int,
             shuffle: bool, pad_tracks: int | None = None,
             workers: int = 2, prefetch: int = 2,
             dataset_sz: int | None = None,
             static_shapes: bool = False):
    """Deterministic per-epoch sharded batches from a wav+npz dir,
    assembled on the prefetching loader so file IO + segmenting overlap
    the device step."""
    from fnssl_tpu.data import DataLoader, FixTrajectoryDataset, \
        Segmenting, collate_segmented
    from fnssl_tpu.parallel import host_local_slice

    ds = FixTrajectoryDataset(data_dir, dataset_sz=dataset_sz,
                              transforms=[Segmenting()])
    sched = host_local_slice(len(ds), epoch, seed=seed, shuffle=shuffle)
    drop_last = True
    if not shuffle:
        sched, drop_last = _eval_schedule(sched, bz, static_shapes)
    return DataLoader(
        lambda entry: ds[entry[0]], sched, bz,
        lambda items: collate_segmented(items, pad_tracks=pad_tracks),
        num_workers=workers, prefetch=prefetch, drop_last=drop_last)


def cmd_simulate(args):
    from fnssl_tpu.data import (
        LibriSpeechDataset, generate, make_fnssl_trajectory_dataset,
        make_ipdnet_trajectory_dataset)

    src = None
    if args.librispeech:
        src = LibriSpeechDataset(args.librispeech, args.T, 16000,
                                 args.num_source, return_vad=True)
    if args.preset == "ipdnet":
        ds = make_ipdnet_trajectory_dataset(
            src, stage=args.stage, T=args.T,
            num_source=tuple(range(1, args.num_source + 1)),
            nb_points=args.nb_points)
    else:
        ds = make_fnssl_trajectory_dataset(
            src, T=args.T, num_source=args.num_source,
            nb_points=args.nb_points, seed=args.seed)
    generate(args.out, args.num, dataset=ds, compact=args.compact,
             log_every=max(args.num // 10, 1))
    print(f"wrote {args.num} scenes to {args.out}")


def _snapshot_config(args):
    import jax

    if jax.process_index() != 0:     # rank-0 gating (is_global_zero)
        return
    os.makedirs(args.log_dir, exist_ok=True)
    with open(os.path.join(args.log_dir, "config.json"), "w") as f:
        json.dump({k: v for k, v in vars(args).items()
                   if not callable(v)}, f, indent=2, default=str)
    from fnssl_tpu.utils.logging import tag_and_log_git_status
    tag_and_log_git_status(os.path.join(args.log_dir, "git.out"),
                           note=f"{args.cmd} {args.model}")


def _resolve_rss_limit(value: float | None) -> float | None:
    """None → 70% of MemTotal; 0/negative → disabled."""
    if value is not None:
        return value if value > 0 else None
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal"):
                    return 0.7 * int(line.split()[1]) / 1e6
    except OSError:
        pass
    return None


def _spawn_world(args) -> None:
    """One-command multi-process DP launch: re-exec this fit N times
    with --coordinator/--num-processes/--process-id filled in and wait
    for the world (the reference's Lightning per-device auto-spawn,
    Lightning/main.py:286-288). Rank 0 inherits this terminal; other
    ranks write <log-dir>/rankK.spawn.log. Exits with the first
    non-zero child code."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    argv, skip = [], False
    for a in args._argv:
        if skip:
            skip = False
            continue
        if a == "--spawn":
            skip = True
            continue
        if a.startswith("--spawn="):
            continue
        argv.append(a)
    env = dict(os.environ)
    # children must resolve fnssl_tpu even when run from a source tree
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    if args.platform == "cpu" and "XLA_FLAGS" not in env:
        # one device per rank + generous collective timeouts (a rank
        # paying a first-compile must not trip its peers' collectives)
        env["XLA_FLAGS"] = (
            "--xla_force_host_platform_device_count=1"
            " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
            " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    os.makedirs(args.log_dir, exist_ok=True)
    procs, logs = [], []
    for rank in range(args.spawn):
        cmd = [sys.executable, "-m", "fnssl_tpu.cli"] + argv + [
            "--coordinator", f"127.0.0.1:{port}",
            "--num-processes", str(args.spawn),
            "--process-id", str(rank)]
        if rank == 0:
            procs.append(subprocess.Popen(cmd, env=env))
        else:
            logf = open(os.path.join(args.log_dir,
                                     f"rank{rank}.spawn.log"), "w")
            logs.append(logf)
            procs.append(subprocess.Popen(cmd, env=env, stdout=logf,
                                          stderr=subprocess.STDOUT))
    rcs = [p.wait() for p in procs]
    for logf in logs:
        logf.close()
    bad = [(i, rc) for i, rc in enumerate(rcs) if rc]
    if bad:
        raise SystemExit(f"spawned ranks failed: {bad} "
                         f"(see {args.log_dir}/rankK.spawn.log)")


def cmd_fit(args):
    from fnssl_tpu.train.learner import EarlyStopping, Learner
    from fnssl_tpu.utils.logging import set_seed

    if getattr(args, "spawn", None) and args.spawn > 1 \
            and args.num_processes is None:
        return _spawn_world(args)
    _init_runtime(args)
    if args.debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)
    set_seed(args.seed)
    _snapshot_config(args)
    task = _make_task(args.model, args)
    params = _init_params(args.model, task, args.seed)
    defaults = {"fnssl": (1e-3, 0.8988), "fnssl_doa": (1e-3, 0.8988),
                "ipdnet": (5e-4, 0.975), "ipdnet_offline": (5e-4, 0.975),
                "variable_ipdnet": (5e-4, 0.975),
                "ipdnet2": (5e-4, 0.975)}
    lr, gamma = defaults[args.model]
    if getattr(args, "lr_gamma", None):
        gamma = args.lr_gamma
    if args.model == "ipdnet2":
        if not args.realman_csv or not args.realman_noise:
            raise SystemExit("ipdnet2 trains on RealMAN: pass "
                             "--realman-csv and --realman-noise")
        train_fn = lambda e: _realman_batches(args, args.bz, e,  # noqa
                                              args.seed, True,
                                              data_dir=args.train_dir)
        valid_fn = lambda e: _realman_batches(args, args.bz, 0,  # noqa
                                              args.seed, False,
                                              data_dir=args.valid_dir,
                                              csv=args.realman_valid_csv)
    else:
        pad = getattr(task.cfg, "max_track", None)
        train_fn = lambda e: _batches(args.train_dir, args.bz, e,  # noqa
                                      args.seed, True, pad,
                                      args.workers, args.prefetch,
                                      dataset_sz=args.train_size)
        valid_fn = lambda e: _batches(args.valid_dir, args.bz, 0,  # noqa
                                      args.seed, False, pad,
                                      args.workers, args.prefetch,
                                      static_shapes=_static_shapes(args))
    # The γ^epoch decay steps at EPOCH boundaries (torch ExponentialLR
    # semantics): the optimizer's step counter must know the epoch
    # length, or the decay is applied per step and the lr collapses
    # after one multi-hundred-step epoch.
    steps_per_epoch = max(len(train_fn(0)), 1)
    learner = Learner(
        task.loss_fn, params, optimizer="adamw"
        if args.model == "ipdnet2" else "adam",
        lr=args.lr or lr, lr_gamma=gamma,
        steps_per_epoch=steps_per_epoch,
        grad_clip=5.0 if args.model == "ipdnet2" else None,
        log_dir=args.log_dir, use_mesh=args.use_mesh, seed=args.seed,
        early_stopping=EarlyStopping(args.early_stop_patience,
                                     args.early_stop_min_delta))
    if args.resume:
        learner.resume()
    rss_limit = _resolve_rss_limit(args.rss_restart_gb)
    if (args.num_processes or 1) > 1:
        # Self-healing re-exec restarts ONE rank of a lockstep world:
        # the re-exec'd rank re-enters Learner.__init__ and waits alone
        # at a coordination_barrier its peers (whose process-local
        # barrier sequence has advanced) will never revisit — a silent
        # hang until the barrier timeout. Whole-world restart is the
        # supported recovery for multi-process runs, so explicit
        # single-rank restart flags are refused and the auto RSS limit
        # is disarmed.
        if args.stall_restart_s or args.rss_restart_gb:
            raise SystemExit(
                "--stall-restart-s/--rss-restart-gb re-exec a single "
                "rank, which deadlocks a multi-process world (barrier "
                "ids are process-local sequence numbers); restart the "
                "whole world instead")
        rss_limit = None
    start_epoch = learner.epoch      # nonzero after --resume

    def _stall_reexec():
        # a wedged tunnel blocks every device call uncancellably — the
        # only recovery is a fresh process resuming from the last epoch
        # checkpoint (same shape as the rss-restart below, but fired
        # from the watchdog thread because the main thread is stuck)
        import sys
        argv = list(getattr(args, "_argv", sys.argv[1:]))
        if "--resume" not in argv:
            argv.append("--resume")
        print("stall re-exec: fnssl_tpu.cli " + " ".join(argv), flush=True)
        os.execv(sys.executable,
                 [sys.executable, "-m", "fnssl_tpu.cli"] + argv)

    fit_kw = dict(rss_limit_gb=rss_limit,
                  stall_timeout_s=args.stall_restart_s or None,
                  stall_action=_stall_reexec,
                  valid_every=getattr(args, "valid_every", 1))
    if getattr(args, "profile", 0) > 0:
        from fnssl_tpu.utils.profiling import trace

        profiled = min(args.profile, args.epochs)
        with trace(os.path.join(args.log_dir, "profile")):
            history = learner.fit(train_fn, valid_fn, epochs=profiled,
                                  **fit_kw)
        # continue only if the profiled fit ran to its epoch budget —
        # early stopping / SIGTERM during it means the run is over
        if args.epochs > profiled and learner.epoch >= profiled \
                and not learner.hit_rss_limit:
            history2 = learner.fit(train_fn, valid_fn, epochs=args.epochs,
                                   **fit_kw)
            for k in history:
                history[k].extend(history2[k])
    else:
        history = learner.fit(train_fn, valid_fn, epochs=args.epochs,
                              **fit_kw)
    epoch_reached = learner.epoch
    restart = getattr(learner, "hit_rss_limit", False) \
        and epoch_reached < args.epochs
    learner.close()
    if restart:
        # fresh process = fresh TPU client: the leaked transfer staging
        # memory is reclaimed, training continues from the checkpoint
        import sys
        argv = list(getattr(args, "_argv", sys.argv[1:]))
        if "--resume" not in argv:
            argv.append("--resume")
        print(f"re-exec at epoch {epoch_reached}: fnssl_tpu.cli "
              + " ".join(argv), flush=True)
        os.execv(sys.executable,
                 [sys.executable, "-m", "fnssl_tpu.cli"] + argv)
    print(json.dumps({"final_train": history["train"][-1],
                      "final_valid": history["valid"][-1],
                      "best_epoch": start_epoch
                      + int(np.argmin(history["valid"]))}))


def cmd_test(args):
    from fnssl_tpu.eval import PredDOA

    _init_runtime(args)
    _snapshot_config(args)
    task = _make_task(args.model)
    params = _init_params(args.model, task, args.seed)

    metric_fn = None
    if args.model.startswith("fnssl"):
        from fnssl_tpu.models.fnssl import fnssl_apply
        pred_doa = PredDOA()

        def metric_fn(p, batch):
            feats, gt = task.preprocess(batch["mic_sig"], batch["doa"],
                                        batch["vad"])
            pred = fnssl_apply(p, feats, cfg=task.cfg)
            gtd = {"doa": np.asarray(batch["doa"]),
                   "vad_sources": np.asarray(batch["vad"])}
            if args.model == "fnssl_doa":
                # classification head: argmax class = azimuth degree
                # (Learner.py:489-505), not an IPD to grid-decode
                from fnssl_tpu.eval import predgt2doa_cls
                est, _ = predgt2doa_cls(pred)
                nt = min(np.asarray(est["doa"]).shape[1],
                         gtd["doa"].shape[1])
                return pred_doa.evaluate(
                    {k: np.asarray(v)[:, :nt] for k, v in est.items()},
                    {k: v[:, :nt] for k, v in gtd.items()})
            return pred_doa(pred, gtd)
    elif args.model in ("ipdnet", "ipdnet_offline", "variable_ipdnet"):
        from fnssl_tpu.eval import PredDOAMultiTrack
        if args.model == "variable_ipdnet":
            # pairs ride the batch axis; one utterance per forward —
            # decode on the all-pair ('MM') template grid
            from fnssl_tpu.models.ipdnet import (
                variable_ipdnet_apply as _net_apply)
            mt = PredDOAMultiTrack(task.dpipd.mic_location,
                                   max_track=getattr(task.cfg,
                                                     "max_track", 2),
                                   ch_mode="MM")
        else:
            # ipdnet_offline's cfg routes ipdnet_apply through the
            # 312-frame chunked offline inference (models/ipdnet.py)
            from fnssl_tpu.models.ipdnet import ipdnet_apply as _net_apply
            mt = PredDOAMultiTrack(task.dpipd.mic_location,
                                   max_track=task.cfg.max_track)

        def metric_fn(p, batch):
            feats, gt = task.preprocess(batch["mic_sig"], batch["doa"],
                                        batch["vad"])
            pred = _net_apply(p, feats, cfg=task.cfg)
            gtd = {"doa": np.asarray(batch["doa"]),
                   "vad_sources": np.asarray(batch["vad"])}
            return mt(pred, gtd, vad_th=(0.001, 0.5))
    elif args.model == "ipdnet2":
        from fnssl_tpu.eval import PredDOAMultiTrack
        from fnssl_tpu.models.spatialnet import spatialnet_apply
        mt = PredDOAMultiTrack(task.dpipd.mic_location, max_track=2)

        def metric_fn(p, batch):
            feats, _ = task.preprocess(batch["mic_sig"],
                                       batch["azi_deg"],
                                       batch["distance"], batch["vad"],
                                       batch["mic_pos"])
            pred = spatialnet_apply(p, feats, cfg=task.cfg)
            nt = min(pred.shape[1], batch["azi_deg"].shape[1])
            azi = np.asarray(batch["azi_deg"])[:, :nt]
            doa_gt = np.radians(np.stack(
                [np.full_like(azi, 90.0), azi], axis=2))
            dec, _ = mt.pred2doa(np.asarray(pred[:, :nt], np.float32))
            return mt.evaluate(
                dec, {"doa": doa_gt,
                      "vad_sources": np.asarray(batch["vad"])[:, :nt]},
                vad_th=(0.001, 0.5))

    learner, epoch = _restore_learner(args, task, args.model,
                                      metric_fn=metric_fn,
                                      best=getattr(args, "best", False))
    if epoch == 0:
        print("warning: no checkpoint found; testing fresh params")
    if args.model == "ipdnet2":
        if not args.realman_csv:
            raise SystemExit("ipdnet2 tests on RealMAN: pass "
                             "--realman-csv (and --realman-noise)")
        batches = _realman_batches(args, args.bz, 0, args.seed, False,
                                   data_dir=args.data_dir)
    else:
        batches = _batches(args.data_dir, args.bz, 0, args.seed, False,
                           getattr(task.cfg, "max_track", None),
                           getattr(args, "workers", 2),
                           getattr(args, "prefetch", 2),
                           static_shapes=_static_shapes(args))
    metrics = learner.test(batches)
    learner.close()
    print(json.dumps(metrics))


def cmd_predict(args):
    import jax.numpy as jnp

    from fnssl_tpu.eval import PredDOA, PredDOAMultiTrack
    from fnssl_tpu.train.preprocess import stft_features
    from fnssl_tpu.utils.audio_io import read_audio

    if args.model == "ipd_baseline":
        # DNN-free classical path (the reference's wDNN=False,
        # Learner.py:208-214): measured cross-spectrum IPD decoded on
        # the template grid — no checkpoint, no parameters
        from fnssl_tpu.eval import ipd_baseline

        sig, fs = read_audio(args.wav)
        if sig.ndim == 1 or sig.shape[1] != 2:
            raise SystemExit("ipd_baseline needs a 2-channel wav")
        result = ipd_baseline(sig[None].astype(np.float32), PredDOA())
        os.makedirs(args.out, exist_ok=True)
        doa = np.degrees(np.asarray(result["doa"]))
        np.save(os.path.join(args.out, "doa_est.npy"), doa)
        np.save(os.path.join(args.out, "vad_est.npy"),
                np.asarray(result["vad_sources"]))
        print(json.dumps({"frames": int(doa.shape[1]),
                          "tracks": int(doa.shape[-1]),
                          "azimuth_deg_first5":
                              doa[0, :5, 1, 0].tolist(),
                          "out": args.out}))
        return

    task = _make_task(args.model)
    learner, _ = _restore_learner(args, task, args.model)
    params = learner.state.params

    sig, fs = read_audio(args.wav)
    if sig.ndim == 1:
        raise SystemExit("predict needs a multichannel wav")
    x = jnp.asarray(sig[None].astype(np.float32))
    if args.model == "ipdnet":
        from fnssl_tpu.models.ipdnet import ipdnet_apply
        feats = stft_features(x, ch_mode="none", sample_length=280)
        pred = ipdnet_apply(params, feats, cfg=task.cfg)
        decoder = PredDOAMultiTrack(task.dpipd.mic_location,
                                    max_track=task.cfg.max_track)
        result, _ = decoder.pred2doa(pred)
    elif args.model.startswith("fnssl"):
        from fnssl_tpu.models.fnssl import fnssl_apply
        feats = stft_features(x, ch_mode="MM")
        pred = fnssl_apply(params, feats, cfg=task.cfg)
        if args.model == "fnssl_doa":
            from fnssl_tpu.eval import predgt2doa_cls
            result, _ = predgt2doa_cls(pred)
        else:
            result, _ = PredDOA().predgt2doa(pred)
    elif args.model == "ipdnet2":
        from fnssl_tpu.models.spatialnet import spatialnet_apply
        feats = stft_features(x, ch_mode="none", win_shift_ratio=0.625,
                              center=True, sample_length=249)
        pred = spatialnet_apply(params, feats, cfg=task.cfg)
        decoder = PredDOAMultiTrack(task.dpipd.mic_location, max_track=2)
        result, _ = decoder.pred2doa(np.asarray(pred, np.float32))
    else:
        raise SystemExit(f"predict: model {args.model!r} not wired")
    os.makedirs(args.out, exist_ok=True)
    doa = np.degrees(np.asarray(result["doa"]))
    np.save(os.path.join(args.out, "doa_est.npy"), doa)
    np.save(os.path.join(args.out, "vad_est.npy"),
            np.asarray(result["vad_sources"]))
    print(json.dumps({"frames": int(doa.shape[1]),
                      "tracks": int(doa.shape[-1]),
                      "azimuth_deg_first5": doa[0, :5, 1, 0].tolist(),
                      "out": args.out}))
    learner.close()


def _load_stream_model(args):
    """Shared stream/serve head: artifact or best-checkpoint weights.
    Returns (model, task, params, art, frames_per_step)."""
    art, params = None, None
    if args.artifact:
        from fnssl_tpu.runtime.export import load_artifact
        art = load_artifact(args.artifact)
        if art.meta["mode"] != "stream":
            raise SystemExit("needs a `cli export --mode stream` "
                             "artifact")
        model = art.meta["model"]
        task = _make_task(model, args)       # decode metadata only
        frames_per_step = int(art.meta["input_shape"][-1])
    else:
        model = args.model
        task = _make_task(model, args)
        learner, epoch = _restore_learner(args, task, model, best=True)
        if epoch == 0:
            print("warning: no checkpoint found; using fresh params")
        params = learner.state.params
        learner.close()
        frames_per_step = 5 if model == "ipdnet2" else 12
    return model, task, params, art, frames_per_step


def _stream_session_factory(model, task, params, art, nch,
                            frames_per_step, pool=None,
                            host_compute=False):
    """Build (make_localizer, decode) for one model family — every call
    to make_localizer() is an independent stream (fresh model state +
    forgetting-norm statistics); decode is stateless and shared.
    ``pool`` (a runtime.slots.BatchedStreamPool) swaps the per-stream
    chunk step for a leased slot in one batched device program.
    ``host_compute`` pins the per-chunk front-end (STFT/norm/features)
    and the DOA decode to the local CPU jax device: both are chains of
    tiny ops, and on a remote/tunneled accelerator every one of them is
    a round trip — with the flag set, the accelerator sees exactly one
    call per chunk (the batched pool step / model chunk step). Serving
    turns it on; numerics are the same fp32 math on a different
    backend."""
    import contextlib

    import jax

    from fnssl_tpu.eval import PredDOA, PredDOAMultiTrack
    from fnssl_tpu.runtime.streaming import (
        StreamingLocalizer, make_fnssl_stream_step,
        make_ipdnet_stream_step, make_spatialnet_stream_step)

    host_dev = jax.devices("cpu")[0] if host_compute else None

    def _ctx():
        return (jax.default_device(host_dev) if host_dev is not None
                else contextlib.nullcontext())

    def _host(decode_fn):
        """Run a decode on the host CPU device (templates are committed
        there by constructing the decoder under the same context)."""
        if host_dev is None:
            return decode_fn

        def wrapped(chunk):
            with jax.default_device(host_dev):
                return decode_fn(chunk)
        return wrapped

    def _step():
        if pool is not None:
            return pool.session()
        if art is not None:
            return art.clone()
        if model.startswith("fnssl"):
            return make_fnssl_stream_step(params, task.cfg)
        if model == "ipdnet":
            return make_ipdnet_stream_step(params, task.cfg)
        return make_spatialnet_stream_step(params, task.cfg)

    if model == "fnssl_doa":
        from fnssl_tpu.eval import predgt2doa_cls
        decode = _host(lambda chunk: predgt2doa_cls(
            np.asarray(chunk, np.float32))[0])
        make_loc = lambda: StreamingLocalizer(  # noqa: E731
            _step(), nch=nch, ch_mode="MM",
            frames_per_step=frames_per_step, device=host_dev)
    elif model.startswith("fnssl"):
        with _ctx():
            decoder = PredDOA()
        decode = _host(lambda chunk: decoder.predgt2doa(
            np.asarray(chunk, np.float32))[0])
        make_loc = lambda: StreamingLocalizer(  # noqa: E731
            _step(), nch=nch, ch_mode="MM",
            frames_per_step=frames_per_step, device=host_dev)
    elif model == "ipdnet":
        with _ctx():
            decoder = PredDOAMultiTrack(task.dpipd.mic_location,
                                        max_track=task.cfg.max_track)
        decode = _host(lambda chunk: decoder.pred2doa(
            np.asarray(chunk, np.float32))[0])
        make_loc = lambda: StreamingLocalizer(  # noqa: E731
            _step(), nch=nch, ch_mode="none", sample_length=280,
            frames_per_step=frames_per_step, device=host_dev)
    elif model == "ipdnet2":
        # IPDnet2 front-end: torch.stft(center=True), hop 0.625·512,
        # forgetting-norm L=249, all channels (run_IPDnet2.py:82-113)
        with _ctx():
            decoder = PredDOAMultiTrack(task.dpipd.mic_location,
                                        max_track=2)
        decode = _host(lambda chunk: decoder.pred2doa(
            np.asarray(chunk, np.float32))[0])
        make_loc = lambda: StreamingLocalizer(  # noqa: E731
            _step(), nch=nch, ch_mode="none", hop=320, center=True,
            sample_length=249, frames_per_step=frames_per_step,
            device=host_dev)
    else:
        raise SystemExit(f"stream: model {model!r} is not causal "
                         "(the offline/bidirectional variants see future "
                         "frames — use `cli predict` or the chunked "
                         "offline inference in `cli test`)")
    return make_loc, decode


def cmd_stream(args):
    """Chunked streaming DOA over a wav file: audio pushed in
    ``--chunk-ms`` blocks through the stateful streaming runtime
    (explicit LSTM/conv/norm carries, streaming ≡ one-shot), DOA decoded
    per fired output block, wall-clock RTF reported. The reference's
    causal mode (`is_online=True`, runIPDnetOn) has no serving loop at
    all — this is the capability its streaming story implies."""
    from fnssl_tpu.utils.audio_io import read_audio

    _init_runtime(args)
    model, task, params, art, frames_per_step = _load_stream_model(args)

    sig, fs = read_audio(args.wav)
    if sig.ndim == 1:
        raise SystemExit("stream needs a multichannel wav")
    sig = sig.astype(np.float32)
    # deployment-realistic front-end placement: the tiny STFT/norm ops
    # run on the local CPU device, the chip sees one call per chunk
    # (the same configuration `cli serve` uses)
    make_loc, decode = _stream_session_factory(
        model, task, params, art, sig.shape[1], frames_per_step,
        host_compute=True)
    loc = make_loc()

    import time
    step = max(int(fs * args.chunk_ms / 1000.0), 1)
    doas, vads = [], []
    t0 = time.perf_counter()
    for start in range(0, sig.shape[0], step):
        for chunk in loc.push(sig[start: start + step]):
            res = decode(chunk)
            doas.append(np.asarray(res["doa"])[0])
            vads.append(np.asarray(res["vad_sources"])[0])
    wall = time.perf_counter() - t0
    if not doas:
        raise SystemExit("wav shorter than one model chunk")
    doa = np.degrees(np.concatenate(doas, axis=0))   # (nt, 2[, ns])
    vad = np.concatenate(vads, axis=0)
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        np.save(os.path.join(args.out, "doa_est.npy"), doa)
        np.save(os.path.join(args.out, "vad_est.npy"), vad)
    azi = doa[..., 1, 0] if doa.ndim == 3 else doa[..., 1]
    print(json.dumps({
        "chunks": int(np.ceil(sig.shape[0] / step)),
        "out_frames": int(doa.shape[0]),
        "audio_s": round(sig.shape[0] / fs, 3),
        "rtf": round(wall / (sig.shape[0] / fs), 4),
        "azimuth_deg_first5": np.round(azi[:5], 2).tolist(),
        "out": args.out}))


def cmd_serve(args):
    """TCP streaming-localization service (runtime/server.py): one
    independent model stream per connection, PCM in / DOA JSON out —
    the deployment endpoint the reference leaves to the user."""
    from fnssl_tpu.runtime.server import LocalizationServer

    _init_runtime(args)
    model, task, params, art, frames_per_step = _load_stream_model(args)
    nch = args.nch or (len(args.mic_ids.split(","))
                       if model == "ipdnet2" and hasattr(args, "mic_ids")
                       else {"ipdnet2": 5}.get(model, 2))
    pool = None
    if args.slots:
        if art is not None:
            raise SystemExit("--slots serves from a checkpoint (an "
                             "artifact bakes a fixed batch size)")
        from fnssl_tpu.core.pairs import num_pairs
        from fnssl_tpu.runtime.export import _resolve
        from fnssl_tpu.runtime.slots import BatchedStreamPool

        apply_fn, init_state = _resolve(model, task.cfg)
        if model.startswith("fnssl"):
            rows, cin = num_pairs(nch, "MM"), 4
        else:
            rows, cin = 1, 2 * nch
        pool = BatchedStreamPool(
            apply_fn, params, init_state,
            feats_shape=(rows, cin, 256, frames_per_step),
            slots=args.slots)
        pool.warmup()      # compile all tiers before accepting traffic
    make_loc, decode = _stream_session_factory(
        model, task, params, art, nch, frames_per_step, pool=pool,
        host_compute=True)

    server = LocalizationServer(lambda: (make_loc(), decode),
                                host=args.host, port=args.port)
    print(json.dumps({"serving": model, "host": args.host,
                      "port": server.port, "nch": nch}), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


def cmd_export(args):
    """Serialize the trained checkpoint to a hermetic serving artifact:
    StableHLO of the jitted forward (or streaming chunk step) + a
    path-keyed weight bundle + manifest. The reference has no export
    story (deploying it means shipping the model source tree); see
    runtime/export.py."""
    from fnssl_tpu.runtime.export import export_model

    task = _make_task(args.model)
    learner, epoch = _restore_learner(args, task, args.model,
                                      best=getattr(args, "best", False))
    if epoch == 0:
        print("warning: no checkpoint found; exporting fresh params")
    params = learner.state.params
    learner.close()

    if args.model == "ipdnet2":
        cin, nf, chunk = task.cfg.dim_input, task.cfg.num_freqs, 5
    else:                      # fnssl*/ipdnet: 2-mic real/imag features
        cin, nf, chunk = 4, 256, 12
    nt = args.export_t or (chunk if args.mode == "stream" else 298)
    if args.mode == "stream" and nt % chunk:
        raise SystemExit(f"--export-t must be a multiple of the model "
                         f"chunk size ({chunk}) in stream mode")
    feats = np.zeros((args.export_bz, cin, nf, nt), np.float32)
    platforms = (args.platforms.split(",") if args.platforms else None)
    meta = export_model(args.model, params, feats, args.out,
                        mode=args.mode, platforms=platforms,
                        cfg=task.cfg)
    print(json.dumps({"out": args.out, "mode": meta["mode"],
                      "platforms": meta["platforms"],
                      "input_shape": meta["input_shape"],
                      "epoch": epoch}))


def cmd_locata(args):
    """LOCATA evaluation: per-task prediction, VAD-gated ACC/MAE, npy
    dumps, optional 12-panel plot (Predict.py:91-104 flow)."""
    import jax.numpy as jnp

    from fnssl_tpu.data import Segmenting
    from fnssl_tpu.data.arrays import dicit_array_setup
    from fnssl_tpu.data.locata import LocataDataset
    from fnssl_tpu.eval import PredDOA
    from fnssl_tpu.models.fnssl import fnssl_apply
    from fnssl_tpu.train.preprocess import stft_features

    baseline = args.model == "ipd_baseline"
    if baseline:
        # wDNN=False on LOCATA (Learner.py:208-214): no checkpoint
        from fnssl_tpu.eval import ipd_baseline
        task = learner = None
    else:
        task = _make_task(args.model)
        learner, _ = _restore_learner(args, task, args.model)
        params = learner.state.params

    tasks = tuple(int(t) for t in args.tasks.split(","))
    ds = LocataDataset(args.locata_dir, array=args.array, fs=16000,
                       tasks=tasks, dev=True,
                       transforms=[Segmenting()])
    m1, m2 = (int(i) for i in args.mic_pick.split(","))
    setup = dicit_array_setup()
    decoder = PredDOA(mic_location=(setup.mic_pos[m1], setup.mic_pos[m2]))
    os.makedirs(args.out, exist_ok=True)
    metrics = []
    for idx in range(len(ds)):
        mic, gts = ds[idx]
        sig2 = np.stack([mic[:, m1], mic[:, m2]], axis=1)
        if baseline:
            result = ipd_baseline(sig2[None].astype(np.float32), decoder)
        else:
            feats = stft_features(
                jnp.asarray(sig2[None].astype(np.float32)), ch_mode="MM")
            pred = fnssl_apply(params, feats, cfg=task.cfg)
            result, _ = decoder.predgt2doa(pred)
        nseg = min(gts["doa"].shape[0], np.asarray(result["doa"]).shape[1])
        gt = {"doa": gts["doa"][None, :nseg],
              "vad_sources": gts["vad_sources"].mean(axis=1)[None, :nseg]}
        est = {"doa": np.asarray(result["doa"])[:, :nseg],
               "vad_sources": np.asarray(result["vad_sources"])[:, :nseg]}
        m = decoder.evaluate(est, gt, ae_th=args.ae_th,
                             vad_th=(2 / 3, 0.2))
        metrics.append(m)
        np.save(os.path.join(args.out, f"{idx}_gt.npy"),
                np.degrees(gt["doa"]))
        np.save(os.path.join(args.out, f"{idx}_est.npy"),
                np.degrees(est["doa"]))
        np.save(os.path.join(args.out, f"{idx}_vadgt.npy"),
                gt["vad_sources"])
    summary = {k: float(np.mean([m[k] for m in metrics]))
               for k in metrics[0]}
    if args.plot:
        from fnssl_tpu.eval import locata_plot
        locata_plot(args.out + os.sep, args.out + os.sep,
                    n_tasks=len(ds))
    print(json.dumps({"recordings": len(ds), **summary}))
    if learner is not None:
        learner.close()


def main(argv=None):
    import sys

    ap = build_parser()
    args = _apply_yaml_defaults(ap, ap.parse_args(argv))
    args._argv = list(argv) if argv is not None else sys.argv[1:]
    {"simulate": cmd_simulate, "fit": cmd_fit, "test": cmd_test,
     "predict": cmd_predict, "stream": cmd_stream,
     "export": cmd_export, "serve": cmd_serve,
     "locata": cmd_locata}[args.cmd](args)


if __name__ == "__main__":
    main()
