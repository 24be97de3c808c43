"""End-to-end prediction → DOA → metrics wrapper.

Parity: FN-SSL Lightning PredDOA (Lightning/Module.py:650-773) for the
single-source FN-SSL path, and IPDnet's multi-track PredDOA
(IPDnet/Module.py:423-600) decode conventions.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from fnssl_tpu.core.pairs import pair_unbatch
from fnssl_tpu.eval.decode import (
    idl_decode, pd_decode, template_ri, time_pool_ipd)
from fnssl_tpu.eval.metrics import get_metric_multiple, get_metric_single
from fnssl_tpu.physics.dpipd import DPIPD


class PredDOA:
    """DOA decoding + metric wrapper for the 2-mic FN-SSL model.

    The decode grid is the reference's: full (res_the × res_phi) far-field
    template cropped to the single ele=π/2 row and the half azimuth plane
    re-labelled 0..π over 37 points (Lightning/Module.py:716-721).
    """

    def __init__(self, method_mode: str = "IDL",
                 source_num_mode: str = "kNum", max_num_sources: int = 1,
                 res_the: int = 37, res_phi: int = 73, fs: int = 16000,
                 nfft: int = 512, ch_mode: str = "MM",
                 mic_location=((-0.04, 0.0, 0.0), (0.04, 0.0, 0.0)),
                 speed: float = 340.0):
        self.method_mode = method_mode
        self.source_num_mode = source_num_mode
        self.max_num_sources = max_num_sources
        self.fre_used = slice(1, nfft // 2 + 1)
        dpipd = DPIPD(ndoa_candidate=[res_the, res_phi],
                      mic_location=np.asarray(mic_location),
                      nf=nfft // 2 + 1, fre_max=fs / 2, ch_mode=ch_mode,
                      speed=speed)
        tmpl = template_ri(dpipd.template, self.fre_used)
        nele, nazi = tmpl.shape[:2]
        # crop: middle elevation row, half azimuth plane (redefined 0..π)
        self.template = jnp.asarray(
            tmpl[(nele - 1) // 2: (nele - 1) // 2 + 1, (nazi - 1) // 2:])
        self.ele_candidate = jnp.asarray(np.array([np.pi / 2]))
        self.azi_candidate = jnp.asarray(np.linspace(0.0, np.pi, 37))

    def predgt2doa(self, pred_ipd, gt_batch=None, time_pool_size=None):
        """(nb·P, nt, 2nf) model output → pred dict {'doa','vad_sources',
        'spatial_spectrum'} (radians)."""
        p = self.template.shape[-1]
        nb = pred_ipd.shape[0] // p
        ipd = pair_unbatch(jnp.asarray(pred_ipd), nb)  # (nb, P, nt, 2nf)
        ipd = jnp.transpose(ipd, (0, 2, 3, 1))         # (nb, nt, 2nf, P)
        if time_pool_size:
            ipd = time_pool_ipd(ipd, time_pool_size)
        decode = idl_decode if self.method_mode == "IDL" else pd_decode
        res = decode(ipd, self.template, self.ele_candidate,
                     self.azi_candidate,
                     max_num_sources=self.max_num_sources,
                     source_num_mode=self.source_num_mode)
        pred = {"doa": res.doa, "vad_sources": res.vad,
                "spatial_spectrum": res.spatial_spectrum}
        return pred, gt_batch

    def evaluate(self, pred, gt, ae_mode: Sequence[str] = ("azi",),
                 ae_th: float = 5.0, use_vad: bool = True,
                 vad_th=(2 / 3, 2 / 3), source_mode: str = "single"):
        """Metrics in degrees (Lightning/Module.py:748-773 defaults)."""
        # fetch in native dtype first: dtype-converting fetches of device
        # arrays are unimplemented on some backends (axon tunnel)
        doa_gt = np.degrees(np.asarray(gt["doa"]).astype(np.float64))
        doa_est = np.degrees(np.asarray(pred["doa"]).astype(np.float64))
        fn = (get_metric_single if source_mode == "single"
              else get_metric_multiple)
        return fn(doa_gt, np.asarray(gt["vad_sources"]), doa_est,
                  np.asarray(pred["vad_sources"]), ae_mode=ae_mode,
                  ae_th=ae_th, use_vad=use_vad, vad_th=vad_th)

    def __call__(self, pred_batch, gt_batch, **metric_kw):
        pred, gt = self.predgt2doa(pred_batch, gt_batch)
        return self.evaluate(pred, gt, **metric_kw)


class PredDOAMultiTrack:
    """Multi-track IPDnet decode + metrics (IPDnet/Module.py:423-600).

    Each track's (nb, nt, 2nf, P) IPD is decoded independently by
    single-source IDL on an azimuth-only grid (linear arrays: ele=π/2,
    azi 0..π × res_phi), VAD = LS template scale ('UnkNum'); tracks are
    stacked and scored with Hungarian-matched multi-source metrics
    (defaults ae_TH=10, vad_TH=[0.001, 0.5]). ``save_dir`` reproduces the
    per-batch npy dumps (Module.py:592-597).

    ``scale_norm="utterance"`` divides each utterance's LS detection
    scores by max(95th-percentile-of-its-own-scores, the published 0.5
    gate). Why: the LS scale is the projection of the predicted IPD
    onto the template, and on an array geometry the model never saw,
    the whole score distribution deflates together (template mismatch)
    — measured in BASELINE.md r4, the 0.5 gate detects almost nothing
    cross-geometry (FAR 0.013, ACC 0.505) while the frames are cleanly
    separable at 0.3. Per-utterance normalization makes the gate
    scale-invariant across arrays; flooring the normalizer at the gate
    keeps silent/weak recordings from being boosted into false alarms.
    Off by default (reference decode parity, IPDnet/Module.py:546-580).
    """

    def __init__(self, mic_location, max_track: int = 2,
                 res_the: int = 1, res_phi: int = 180, fs: int = 16000,
                 nfft: int = 512, ch_mode: str = "M",
                 speed: float = 340.0, save_dir: str | None = None,
                 scale_norm: str | None = None,
                 scale_norm_floor: float = 0.5):
        if scale_norm not in (None, "utterance"):
            raise ValueError(f"unknown scale_norm {scale_norm!r}")
        self.scale_norm = scale_norm
        self.scale_norm_floor = scale_norm_floor
        self.max_track = max_track
        self.fre_used = slice(1, nfft // 2 + 1)
        self.save_dir = save_dir
        dpipd = DPIPD(ndoa_candidate=[res_the, res_phi],
                      mic_location=np.asarray(mic_location),
                      nf=nfft // 2 + 1, fre_max=fs / 2, ch_mode=ch_mode,
                      speed=speed, ele_range=(np.pi / 2, np.pi / 2),
                      azi_range=(0.0, np.pi))
        self.template = jnp.asarray(template_ri(dpipd.template,
                                                self.fre_used))
        self.ele_candidate = jnp.asarray(
            np.full(res_the, np.pi / 2, np.float32))
        self.azi_candidate = jnp.asarray(
            np.linspace(0.0, np.pi, res_phi).astype(np.float32))

    def pred2doa(self, pred, gt_batch=None):
        """pred: (nb, nt, 2nf, P, max_track) model output."""
        from fnssl_tpu.eval.decode import idl_decode

        pred = jnp.asarray(pred)
        doas, vads = [], []
        for track in range(self.max_track):
            ipd = pred[..., track]                  # (nb, nt, 2nf, P)
            res = idl_decode(ipd, self.template, self.ele_candidate,
                             self.azi_candidate, max_num_sources=1,
                             source_num_mode="unkNum")
            doas.append(res.doa[..., 0])
            vads.append(res.vad[..., 0])
        vad = jnp.stack(vads, axis=-1)                # (nb, nt, tracks)
        if self.scale_norm == "utterance":
            q = jnp.quantile(vad.reshape(vad.shape[0], -1), 0.95, axis=1)
            vad = vad / jnp.maximum(q, self.scale_norm_floor)[:, None,
                                                              None]
        out = {"doa": jnp.stack(doas, axis=-1),
               "vad_sources": vad}
        return out, gt_batch

    def evaluate(self, pred, gt, ae_th: float = 10.0,
                 vad_th=(0.001, 0.5), idx: int | None = None):
        doa_gt = np.degrees(np.asarray(gt["doa"]).astype(np.float64))
        doa_est = np.degrees(np.asarray(pred["doa"]).astype(np.float64))
        vad_gt = np.asarray(gt["vad_sources"])
        vad_est = np.asarray(pred["vad_sources"])
        if self.save_dir is not None and idx is not None:
            import os
            os.makedirs(self.save_dir, exist_ok=True)
            for name, arr in (("doagt", doa_gt), ("doaest", doa_est),
                              ("vadgt", vad_gt), ("vadest", vad_est)):
                np.save(os.path.join(self.save_dir, f"{idx}_{name}.npy"),
                        arr)
        return get_metric_multiple(doa_gt, vad_gt, doa_est, vad_est,
                                   ae_mode=("azi",), ae_th=ae_th,
                                   use_vad=True, vad_th=vad_th)

    def __call__(self, pred_batch, gt_batch, idx: int | None = None,
                 **kw):
        pred, gt = self.pred2doa(pred_batch, gt_batch)
        return self.evaluate(pred, gt, idx=idx, **kw)


def ipd_baseline(mic_sig, decoder: "PredDOA", *, nfft: int = 512,
                 win_len: int = 512, win_shift_ratio: float = 0.5,
                 time_pool_size: int = 12):
    """DNN-free localization baseline: decode the measured cross-spectrum
    IPD directly on the template grid.

    The reference's ``wDNN=False`` path (Learner.py:208-214) subtracts the
    *normalized imaginary parts* of the two channels as a stand-in for
    phase; this implements the physically-correct inter-channel phase
    difference exp(j·(∠X₁−∠X₂)) which the DP-IPD templates model.

    Args: mic_sig (nb, nsample, 2). Returns the PredDOA pred dict.
    """
    from fnssl_tpu.core.stft import stft

    spec = stft(jnp.asarray(mic_sig), win_len=win_len,
                win_shift_ratio=win_shift_ratio, nfft=nfft)
    cross = spec[..., 0] * jnp.conj(spec[..., 1])   # (nb, nf, nt)
    ipd = cross / (jnp.abs(cross) + 1e-8)
    sel = ipd[:, 1: nfft // 2 + 1]
    ri = jnp.concatenate([jnp.real(sel), jnp.imag(sel)], axis=1)
    pred = jnp.transpose(ri, (0, 2, 1))             # (nb, nt, 2nf)
    return decoder.predgt2doa(pred,
                              time_pool_size=time_pool_size)[0]


def predgt2doa_cls(pred_logits, gt_batch=None):
    """Classification-head decode (Learner.py:489-505): argmax class =
    azimuth in degrees; unit VAD. Returns DOA in *radians* like the
    regression path so `PredDOA.evaluate` treats both identically."""
    cls = jnp.argmax(jnp.asarray(pred_logits), axis=-1)   # (nb, nt)
    azi = jnp.deg2rad(cls.astype(jnp.float32))
    ele = jnp.full_like(azi, jnp.pi / 2)
    doa = jnp.stack([ele, azi], axis=2)[..., None]        # (nb, nt, 2, 1)
    vad = jnp.ones(cls.shape + (1,), jnp.float32)
    return {"doa": doa, "vad_sources": vad}, gt_batch
