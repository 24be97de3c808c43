"""Orbax checkpointing with reference-compatible policy and conversion.

Reference policy (SURVEY.md §5.4): save every epoch, keep top-k by
validation loss plus 'last'; resume restores params+opt state+epoch.
Torch ``.tar``/Lightning ``.ckpt`` interop lives in train.convert — params
use the reference state_dict names, so conversion is pure tree plumbing.
"""
from __future__ import annotations

import os
from typing import Any

import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Epoch-keyed checkpoints, keep best-k by a monitored value + last.

    Mirrors Lightning ModelCheckpoint(top-5 on valid/loss, save_last)
    (Lightning/main.py:298-308).
    """

    def __init__(self, directory: str, keep_top_k: int = 5):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep_top_k + 1,
            best_fn=lambda m: -m["valid_loss"],   # keep smallest losses
            best_mode="max",
            create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, epoch: int, state: Any, valid_loss: float):
        """Async save: orbax copies device→host before returning (safe
        with donated buffers), then writes to disk in the background so
        serialization overlaps the next epoch's training. The previous
        save is drained first; restore/close also drain."""
        self._mgr.wait_until_finished()
        self._mgr.save(
            epoch, args=ocp.args.StandardSave(state),
            metrics={"valid_loss": float(valid_loss)})

    def restore(self, state_template: Any, epoch: int | None = None):
        """Restore latest (or given) epoch into the template's structure."""
        self._mgr.wait_until_finished()
        step = self._mgr.latest_step() if epoch is None else epoch
        if step is None:
            return None, None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))
        return restored, step

    def best_epoch(self) -> int | None:
        self._mgr.wait_until_finished()
        return self._mgr.best_step()

    def close(self):
        self._mgr.close()


def save_params_npz(path: str, params, prefix: str = ""):
    """Flat-file params snapshot (wav+npz data contract companion)."""
    from fnssl_tpu.train.convert import nested_to_flat
    np.savez(path, **nested_to_flat(params, prefix))


def load_params_npz(path: str):
    from fnssl_tpu.train.convert import flat_to_nested
    with np.load(path) as f:
        return flat_to_nested({k: f[k] for k in f.files})
