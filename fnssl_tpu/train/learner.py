"""Trainer: epoch loops, checkpointing, early stopping, DP scale-out.

The L4 driver combining the reference's two training paths (raw-torch
Learner.py:14-355 epoch loops + Lightning fit/validate/test semantics,
SURVEY.md §2.5): one jitted step (preprocess+forward+loss fused), orbax
checkpoints with top-k-by-valid-loss + resume, early stopping, EMA loss
display, TensorBoard/JSONL metrics, and optional data-parallel sharding
over a device mesh.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Iterable

import jax
import numpy as np

from fnssl_tpu.parallel import make_mesh, replicate_params, shard_batch
from fnssl_tpu.train.checkpoint import CheckpointManager
from fnssl_tpu.train.step import (
    TrainState, init_train_state, make_eval_step, make_optimizer,
    make_train_step)
from fnssl_tpu.utils.logging import EmaLoss, MetricLogger, detect_infnan


def process_rss_gb() -> float:
    """Resident set size of this process in GB (0.0 if unreadable)."""
    try:
        with open(f"/proc/{os.getpid()}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


class StallWatchdog:
    """Detect a wedged device runtime (SURVEY §5.3 — the reference has no
    failure detection at all).

    The axon/TPU client can wedge so hard that every device call blocks
    forever (observed live: even ``jax.devices()`` hung). No in-process
    recovery exists — the blocked call is uncancellable — so the only
    useful reaction is to leave the process: ``action`` (default
    ``os._exit(3)``) runs on the monitor thread once no heartbeat has
    arrived for ``timeout_s``. Training resumes from the last epoch
    checkpoint via ``Learner.resume()`` (the CLI re-execs itself with
    ``--resume``, mirroring the rss-restart path).

    ``timeout_s`` must exceed the first-step compile (45–600 s observed
    on the tunnelled chip); the CLI flag is ``--stall-restart-s``
    (off unless given).
    """

    def __init__(self, timeout_s: float, action: Callable | None = None):
        import threading

        self.timeout_s = float(timeout_s)
        self.action = action or self._default_action
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    @staticmethod
    def _default_action():
        os._exit(3)

    def beat(self):
        self._last = time.monotonic()

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()

    def _run(self):
        poll = min(max(self.timeout_s / 4.0, 0.05), 60.0)
        while not self._stop.wait(poll):
            if time.monotonic() - self._last > self.timeout_s:
                print(f"stall watchdog: no training progress for "
                      f"{self.timeout_s:.0f}s — device runtime wedged, "
                      "leaving the process (resume() continues from the "
                      "last epoch checkpoint)", flush=True)
                self.action()
                return


class EarlyStopping:
    """Stop after ``patience`` epochs without ``min_delta`` improvement
    (Lightning/main.py:290-296). ``patience <= 0`` disables stopping."""

    def __init__(self, patience: int = 10, min_delta: float = 0.01):
        self.patience = patience
        self.min_delta = min_delta
        self.best = np.inf
        self.bad_epochs = 0

    def update(self, value: float) -> bool:
        """Returns True when training should stop."""
        if value < self.best - self.min_delta:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        return self.patience > 0 and self.bad_epochs >= self.patience


class Learner:
    def __init__(self, loss_fn: Callable, params, *,
                 optimizer: str = "adam", lr: float = 1e-3,
                 lr_gamma: float = 0.8988, grad_clip: float | None = None,
                 steps_per_epoch: int = 1, log_dir: str = "runs/default",
                 keep_top_k: int = 5, use_mesh: bool = False,
                 metric_fn: Callable | None = None,
                 early_stopping: EarlyStopping | None = None,
                 seed: int = 2):
        self.tx = make_optimizer(optimizer, lr, lr_gamma, steps_per_epoch,
                                 grad_clip)
        self.state = init_train_state(params, self.tx)
        self.train_step = make_train_step(loss_fn, self.tx)
        self.eval_step = make_eval_step(loss_fn)
        # Multi-process DP: the checkpoint dir is SHARED (orbax
        # coordinates the save across processes), but metric/TB logs are
        # rank-gated — non-primary ranks write to a rank subdir so the
        # jsonl/TB event files never interleave (is_global_zero,
        # Lightning/main.py:138-142).
        rank = jax.process_index()
        self.logger = MetricLogger(
            log_dir if rank == 0 else os.path.join(log_dir, f"rank{rank}"),
            use_tensorboard=(rank == 0))
        if jax.process_count() > 1:
            # Align ranks BEFORE orbax's first cross-process sync: the
            # Gloo CPU-collectives context init has a hardcoded 30 s KV
            # timeout, and a rank still paying first-compile can lag its
            # peers past it on a loaded host (coordination_barrier doc).
            from fnssl_tpu.parallel.distributed import coordination_barrier
            coordination_barrier("learner_init")
        self.ckpt = CheckpointManager(os.path.join(log_dir, "ckpt"),
                                      keep_top_k=keep_top_k)
        self.metric_fn = metric_fn
        self.early_stopping = early_stopping or EarlyStopping()
        self.epoch = 0
        # deferred-loss flush interval: bounds live device buffers in
        # long epochs (the reference's epochs reach ~10k steps)
        self.fetch_chunk = 512
        self._watchdog: StallWatchdog | None = None
        self.rng = jax.random.PRNGKey(seed)
        self.mesh = make_mesh() if use_mesh else None
        if self.mesh is not None:
            self.state = replicate_params(self.state, self.mesh)

    def _place(self, batch):
        return shard_batch(batch, self.mesh) if self.mesh else batch

    def _placed_stream(self, batches):
        """Device-prefetched batch stream: transfers for batch t+1 start
        while batch t computes. The mesh path prefetches through
        ``shard_batch`` (multi-process assembly needs
        make_array_from_process_local_data, not a plain device_put —
        both dispatch transfers asynchronously, so the lookahead
        overlaps host→HBM with the device step either way)."""
        from fnssl_tpu.data.loader import prefetch_to_device

        if self.mesh is not None:
            return prefetch_to_device(batches, size=2, put=self._place)
        return prefetch_to_device(batches, size=2)

    def resume(self, best: bool = False):
        """Restore the latest checkpoint if one exists. ``best=True``
        restores the top-ranked epoch by valid loss instead (the
        reference's best_model.tar selection, Learner.py:343-353)."""
        epoch = self.ckpt.best_epoch() if best else None
        restored, step = self.ckpt.restore(self.state, epoch=epoch)
        if restored is not None:
            self.state = TrainState(*restored) if isinstance(
                restored, (list, tuple)) else restored
            self.epoch = int(step) + 1
            print(f"resumed from epoch {step}")
        return self.epoch

    def train_epoch(self, batches: Iterable) -> float:
        from fnssl_tpu.utils.logging import ProgressLine

        ema = EmaLoss()
        last = 0.0
        t0 = time.time()
        progress = ProgressLine(
            self.epoch, total=len(batches) if hasattr(batches, "__len__")
            else None)
        # Interactive runs fetch each loss for the live display; batch
        # runs defer fetches to stacked transfers — per-step scalar
        # fetches are a full host↔device round trip (~30 ms on a
        # tunneled chip), which serializes the pipeline. Deferred
        # fetches flush every ``fetch_chunk`` steps so a 10k-step epoch
        # holds at most ``fetch_chunk`` live device buffers (the flush
        # blocks only on step i-fetch_chunk, which has long finished).
        live = progress.visible
        pending: list = []
        host_vals: list[float] = []
        self._max_pending = 0

        def _flush():
            if pending:
                import jax.numpy as jnp

                host_vals.extend(
                    np.asarray(jnp.stack(pending), np.float32).tolist())
                pending.clear()

        for i, batch in enumerate(self._placed_stream(batches)):
            self.rng, sub = jax.random.split(self.rng)
            self.state, loss = self.train_step(self.state, batch, sub)
            if self._watchdog is not None:
                self._watchdog.beat()
            if live:
                last = ema.update(float(loss))
                progress.update(last)
            else:
                pending.append(loss)
                self._max_pending = max(self._max_pending, len(pending))
                if len(pending) >= self.fetch_chunk:
                    _flush()
        progress.close()
        _flush()
        for v in host_vals:
            last = ema.update(v)
        self.logger.log("train/loss", last, self.epoch)
        self.logger.log("train/epoch_s", time.time() - t0, self.epoch)
        return last

    def eval_epoch(self, batches: Iterable, split: str = "valid"
                   ) -> dict[str, float]:
        # Per-sample weighting: a ragged last batch must not bias the
        # epoch mean (the reference accumulates per-sample; this number
        # drives top-k checkpoint ranking).
        dev_losses, weights, metrics_acc = [], [], []
        for batch in batches:
            # device scalar kept on device; one stacked fetch below
            # (a per-batch fetch is a host↔device round trip each time)
            dev_losses.append(self.eval_step(self.state.params,
                                             self._place(batch)))
            if self._watchdog is not None:
                self._watchdog.beat()
            weights.append(float(len(jax.tree_util.tree_leaves(batch)[0])))
            if self.metric_fn is not None:
                metrics_acc.append(self.metric_fn(self.state.params, batch))
        if not dev_losses:
            return {"loss": float("nan")}
        import jax.numpy as jnp

        fetched = np.asarray(jnp.stack(dev_losses), np.float32)
        keep = [i for i, v in enumerate(fetched)
                if not detect_infnan(float(v), f"{split}/loss")]
        if not keep:
            # Every batch diverged: report NaN and keep training (the
            # filtering exists to survive divergence, not crash on it).
            return {"loss": float("nan")}
        losses = fetched[keep]
        w = np.asarray(weights)[keep]
        metrics_acc = ([metrics_acc[i] for i in keep] if metrics_acc
                       else metrics_acc)
        out = {"loss": float(np.average(losses, weights=w))}
        if metrics_acc:
            for k in metrics_acc[0]:
                # metric values may be vectors (e.g. multi-entry ae_mode):
                # average along the batch axis only, fold scalars to float
                avg = np.average(
                    np.asarray([m[k] for m in metrics_acc], np.float64),
                    axis=0, weights=w)
                out[k] = float(avg) if avg.ndim == 0 else avg.tolist()
        self.logger.log_dict(out, self.epoch, prefix=f"{split}/")
        return out

    def fit(self, train_batches_fn: Callable[[int], Iterable],
            valid_batches_fn: Callable[[int], Iterable],
            epochs: int = 100, rss_limit_gb: float | None = None,
            stall_timeout_s: float | None = None,
            stall_action: Callable | None = None,
            valid_every: int = 1) -> dict:
        """Full training: per-epoch train + validate + checkpoint + early
        stop. ``*_batches_fn(epoch)`` returns that epoch's batch iterable
        (deterministic per-epoch shuffling hooks in here).

        Preemption-safe (SURVEY §5.3): SIGTERM/SIGINT request a graceful
        stop at the next epoch boundary, where the state is checkpointed
        so ``resume()`` continues exactly — the reference has no
        preemption story beyond manual --ckpt_path resume.

        ``rss_limit_gb`` guards host memory: when the process RSS
        exceeds it at an epoch boundary (state already checkpointed),
        fit returns early with ``self.hit_rss_limit = True`` so the
        caller can re-exec and ``resume()``. Exists because the axon
        TPU client leaks ~1:1 host memory for every host→device
        transfer payload (measured: 100 × 20.5 MB device_put → +2.0 GB
        RSS, regardless of source reuse or .delete()), so any
        sufficiently long file-backed training would OOM the host —
        a bounded-memory restart turns that into a non-event.

        ``stall_timeout_s`` arms a :class:`StallWatchdog`: if no step or
        eval batch completes for that long, ``stall_action`` runs on the
        monitor thread (default: exit the process with code 3, since a
        wedged device call cannot be cancelled in-process). Pick a
        timeout above the worst-case first-step compile.

        ``valid_every`` validates (and checkpoints) every N epochs
        instead of every epoch — for many-tiny-epoch regimes (e.g. a
        256-scene corpus at a 20k-step budget is 640 epochs of 32
        steps, where per-epoch validation would dominate wall time).
        The final epoch, an interrupt, and an RSS-limit stop always
        validate + checkpoint, so resume/early-stop semantics hold;
        early stopping counts only validated epochs.
        """
        import signal

        interrupted = {"flag": False}

        def _request_stop(signum, frame):
            print(f"signal {signum}: checkpointing at epoch boundary")
            interrupted["flag"] = True

        prev = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev[sig] = signal.signal(sig, _request_stop)
            except ValueError:  # non-main thread
                pass

        history = {"train": [], "valid": []}
        self.hit_rss_limit = False
        if stall_timeout_s:
            self._watchdog = StallWatchdog(stall_timeout_s,
                                           stall_action).start()
        try:
            while self.epoch < epochs:
                train_loss = self.train_epoch(train_batches_fn(self.epoch))
                history["train"].append(train_loss)
                rss_hit = bool(rss_limit_gb
                               and process_rss_gb() > rss_limit_gb)
                do_valid = (valid_every <= 1
                            or (self.epoch + 1) % valid_every == 0
                            or self.epoch + 1 >= epochs
                            or rss_hit or interrupted["flag"])
                stop = False
                if do_valid:
                    valid = self.eval_epoch(valid_batches_fn(self.epoch))
                    history["valid"].append(valid["loss"])
                    # a fully-diverged (NaN) epoch must never rank
                    # "best": NaN ordering in the top-k best_fn is
                    # undefined
                    self.ckpt.save(self.epoch, self.state,
                                   valid["loss"]
                                   if np.isfinite(valid["loss"])
                                   else float("inf"))
                    if self._watchdog is not None:
                        self._watchdog.beat()  # the save drain blocks too
                    stop = self.early_stopping.update(valid["loss"])
                    print(f"epoch {self.epoch}: train {train_loss:.5f} "
                          f"valid {valid['loss']:.5f}"
                          + (" [early stop]" if stop else ""))
                else:
                    print(f"epoch {self.epoch}: train {train_loss:.5f}")
                self.epoch += 1
                if rss_hit:
                    self.hit_rss_limit = True
                    print(f"host RSS {process_rss_gb():.1f} GB > limit "
                          f"{rss_limit_gb:.1f} GB: checkpointed, "
                          "requesting restart")
                    break
                if stop or interrupted["flag"]:
                    break
        finally:
            if self._watchdog is not None:
                self._watchdog.stop()
                self._watchdog = None
            for sig, handler in prev.items():
                signal.signal(sig, handler)
        return history

    def write_flops(self, apply_fn, example, **kw):
        """FLOPs.yaml into the run dir (the reference's on_train_start
        write_FLOPs hook, Lightning/main.py:146-147)."""
        from fnssl_tpu.utils.flops import write_flops

        return write_flops(apply_fn, self.state.params, example,
                           self.logger.log_dir, **kw)

    def test(self, batches: Iterable) -> dict[str, float]:
        return self.eval_epoch(batches, split="test")

    def close(self):
        self.logger.close()
        self.ckpt.close()
