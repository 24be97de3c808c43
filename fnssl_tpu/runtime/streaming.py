"""Real-time chunked localization runtime.

The causal-mode driver the reference lacks as a first-class API
(SURVEY.md §5.7): runIPDnetOn's ``is_online`` networks are causal, but
the reference discards all state at utterance boundaries; here every
stage carries explicit streaming state —

  sample ring buffer → STFT frames → streaming forgetting-norm →
  model chunk step (LSTM/conv/Mamba carries) → optional DOA decode

and chunked output is *bit-equal* to the one-shot pipeline. Audio can be
pushed in arbitrary-sized pieces; model steps fire whenever a full
frame-chunk (12 frames for FN-SSL/IPDnet, 5 for IPDnet2) is buffered.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from fnssl_tpu.core.norm import forgetting_norm_streaming, init_state
from fnssl_tpu.core.pairs import num_pairs, pair_rebatch
from fnssl_tpu.core.stft import stft


class StreamingLocalizer:
    """Push-based streaming front-end + model driver (batch size 1).

    Args:
      model_step: fn(feats (1·P, C, nf_used, k)) → (output chunk, ...);
        built via ``make_fnssl_stream_step``/``make_ipdnet_stream_step``
        or any callable carrying its own state.
      nch: microphone count.
      ch_mode: 'M'/'MM' pair features, or 'none' (all channels).
      frames_per_step: model chunk size (12 FN-SSL/IPDnet, 5 IPDnet2).
      device: optional jax.Device the FRONT-END (STFT framing,
        forgetting-norm, feature assembly) runs on. The front-end is a
        chain of tiny ops; on a remote/tunneled accelerator each one is
        a host↔device round trip that dwarfs its compute (the measured
        r4 single-connection serve RTT), so serving passes the local
        CPU device here and the accelerator sees exactly ONE call per
        chunk — the model step. None keeps everything on the default
        device (the one-shot-parity configuration the streaming tests
        pin down).
    """

    def __init__(self, model_step: Callable, nch: int, *,
                 ch_mode: str = "MM", win_len: int = 512, hop: int = 256,
                 nfft: int = 512, sample_length: int = 298,
                 frames_per_step: int = 12, eps: float = 1e-6,
                 center: bool = False, device=None):
        self.model_step = model_step
        self._device = device
        self.nch = nch
        self.ch_mode = ch_mode
        self.win_len, self.hop, self.nfft = win_len, hop, nfft
        self.sample_length = sample_length
        self.frames_per_step = frames_per_step
        self.eps = eps
        # center=True (the IPDnet2 torch.stft convention) reflect-pads
        # nfft//2 at the signal start — in a stream that's a one-time
        # prefix built from the first nfft//2+1 samples; frames then cut
        # exactly like center=False over the augmented buffer. (The
        # one-shot end padding has no live-stream equivalent: those tail
        # frames simply fire once real audio fills their window.)
        self._need_prefix = bool(center)
        rows = (num_pairs(nch, ch_mode) if ch_mode != "none" else 1)
        with self._frontend_ctx():
            # committed to the front-end device: every op touching the
            # carried norm state then runs there without annotation
            self._norm_state = jax.tree.map(jnp.asarray, init_state(rows))
        self._samples = np.zeros((0, nch), np.float32)
        self._frames = None          # (rows, 2, nf, nt) complex buffer
        self.processed_s = 0.0
        self.compute_s = 0.0

    def _frontend_ctx(self):
        return (jax.default_device(self._device)
                if self._device is not None else contextlib.nullcontext())

    def _frame_chunk(self) -> jax.Array | None:
        """Consume buffered samples into STFT frames (exact one-shot
        framing: frames advance by hop, each sees win_len samples)."""
        if self._need_prefix:
            pad = self.nfft // 2
            if self._samples.shape[0] < pad + 1:
                return None
            prefix = self._samples[pad:0:-1]       # np.pad mode="reflect"
            self._samples = np.concatenate([prefix, self._samples], axis=0)
            self._need_prefix = False
        n = self._samples.shape[0]
        if n < self.win_len:
            return None
        nt = (n - self.win_len) // self.hop + 1
        spec = stft(jnp.asarray(self._samples[None]), win_len=self.win_len,
                    win_shift_ratio=self.hop / self.win_len,
                    nfft=self.nfft, center=False)     # (1, nf, nt, nch)
        self._samples = self._samples[nt * self.hop:]
        spec = jnp.transpose(spec, (0, 3, 1, 2))      # (1, nch, nf, nt)
        if self.ch_mode != "none":
            spec = pair_rebatch(spec, ch_mode=self.ch_mode)
        return spec

    def push(self, chunk: np.ndarray) -> list:
        """Feed (nsample, nch) audio; returns model outputs fired."""
        t0 = time.perf_counter()
        self._samples = np.concatenate(
            [self._samples, np.asarray(chunk, np.float32)], axis=0)
        self.processed_s += chunk.shape[0] / 16000.0
        with self._frontend_ctx():
            spec = self._frame_chunk()
            if spec is not None:
                self._frames = (spec if self._frames is None else
                                jnp.concatenate([self._frames, spec], -1))
        outputs = []
        k = self.frames_per_step
        while self._frames is not None and self._frames.shape[-1] >= k:
            with self._frontend_ctx():
                frames, self._frames = (self._frames[..., :k],
                                        self._frames[..., k:])
                mag = jnp.abs(frames)
                mean, self._norm_state = forgetting_norm_streaming(
                    mag, self._norm_state,
                    sample_length=self.sample_length)
                denom = mean + self.eps
                feats = jnp.concatenate([jnp.real(frames) / denom,
                                         jnp.imag(frames) / denom], axis=1)
                feats = feats[:, :, 1: self.nfft // 2 + 1, :]
                if self._device is not None:
                    # hand the model step (pool submit / jitted chunk
                    # step on the accelerator) a plain host array
                    feats = np.asarray(feats)
            out = self.model_step(feats)
            # block so self.rtf reflects true wall-clock compute (async
            # dispatch would otherwise undercount massively)
            jax.block_until_ready(out)
            outputs.append(out)
        self.compute_s += time.perf_counter() - t0
        return outputs

    @property
    def rtf(self) -> float:
        """Real-time factor: compute time / audio time (<1 ⇒ real-time)."""
        return self.compute_s / max(self.processed_s, 1e-9)


def make_fnssl_stream_step(params, cfg=None, nf: int = 256):
    """Stateful FN-SSL chunk step for StreamingLocalizer."""
    from fnssl_tpu.models.fnssl import (
        FNSSLConfig, fnssl_apply, init_fnssl_state)

    cfg = cfg or FNSSLConfig()
    state = {"s": None}

    def step(feats):
        if state["s"] is None:
            state["s"] = init_fnssl_state(feats.shape[0], nf, cfg)
        out, state["s"] = fnssl_apply(params, feats, cfg=cfg,
                                      state=state["s"], return_state=True)
        return out

    return step


def make_ipdnet_stream_step(params, cfg=None, nf: int = 256):
    """Stateful IPDnet chunk step (LSTM + causal-conv carries)."""
    from fnssl_tpu.models.ipdnet import (
        IPDnetConfig, init_ipdnet_state, ipdnet_apply)

    cfg = cfg or IPDnetConfig()
    state = {"s": None}

    def step(feats):
        if state["s"] is None:
            state["s"] = init_ipdnet_state(feats.shape[0], nf, cfg)
        out, state["s"] = ipdnet_apply(params, feats, cfg=cfg,
                                       state=state["s"], return_state=True)
        return out

    return step


def make_spatialnet_stream_step(params, cfg=None):
    """Stateful OnlineSpatialNet chunk step (encoder + Mamba carries)."""
    from fnssl_tpu.models.spatialnet import (
        SpatialNetConfig, init_spatialnet_state, spatialnet_apply)

    cfg = cfg or SpatialNetConfig()
    state = {"s": None}

    def step(feats):
        if state["s"] is None:
            state["s"] = init_spatialnet_state(feats.shape[0], cfg)
        out, state["s"] = spatialnet_apply(params, feats, cfg=cfg,
                                           state=state["s"],
                                           return_state=True)
        return out

    return step
