"""Pre-generated dataset reader + batching (wav + pickled-scene npz).

Parity: FN-SSL/Dataset.py:491-545 ``FixTrajectoryDataset``. Returns
(mic_signals, {'doa', 'vad_sources'}) at the segment rate when a
Segmenting transform is attached.
"""
from __future__ import annotations

import os

import numpy as np

from fnssl_tpu.data.scene import AcousticScene, load_file


class FixTrajectoryDataset:
    def __init__(self, data_dir: str, dataset_sz: int | None = None,
                 transforms=None, return_acoustic_scene: bool = False):
        self.transforms = transforms
        self.data_paths = sorted(
            os.path.join(data_dir, f) for f in os.listdir(data_dir)
            if f.endswith(".wav"))
        self.dataset_sz = (len(self.data_paths) if dataset_sz is None
                           else dataset_sz)
        self.return_acoustic_scene = return_acoustic_scene

    def __len__(self):
        return self.dataset_sz

    def __getitem__(self, idx):
        if isinstance(idx, tuple):
            idx = idx[0]  # per-item seeds are irrelevant for fixed data
        if idx < 0:
            idx = len(self) + idx
        sig_path = self.data_paths[idx]
        acous_path = sig_path[:-4] + ".npz"
        mic_signals, scene = load_file(AcousticScene.empty(), sig_path,
                                       acous_path)
        if self.transforms is not None:
            for t in self.transforms:
                mic_signals, scene = t(mic_signals, scene)
        if self.return_acoustic_scene:
            return mic_signals, scene
        return mic_signals.astype(np.float32), {
            "doa": scene.DOAw.astype(np.float32),
            "vad_sources": scene.mic_vad_sources}


def collate_segmented(items, pool: int = 12, pad_tracks: int | None = None):
    """Stack dataset items into the jit batch contract
    {'mic_sig', 'doa', 'vad'} — VAD windows reduced to their window mean
    (the reference's ``vad_batch.mean(axis=2)`` at main.py:242).

    ``pad_tracks`` zero-pads the source axis to a fixed track count (the
    reference's fixed-shape gt padding, IPDnet/Dataset.py:518-534) so
    1-source data trains multi-track PIT models.
    """
    def pad(a):
        # per-item pad (before stacking): batches may mix source counts
        # when num_source is sampled per scene (IPDnet/Dataset.py:518-534
        # pads each item to a fixed track count for exactly this reason)
        if pad_tracks is not None and a.shape[-1] < pad_tracks:
            extra = pad_tracks - a.shape[-1]
            a = np.concatenate(
                [a, np.zeros(a.shape[:-1] + (extra,), a.dtype)], -1)
        return a

    mic = np.stack([x for x, _ in items]).astype(np.float32)
    doa = np.stack([pad(g["doa"]) for _, g in items]).astype(np.float32)
    # (nb, nseg, 2, ns); vad windows (nb, nseg, K, ns) → mean over K
    vad = np.stack([pad(g["vad_sources"]) for _, g in items])
    vad = vad.mean(axis=2).astype(np.float32)
    return {"mic_sig": mic, "doa": doa, "vad": vad}
