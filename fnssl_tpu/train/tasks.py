"""End-to-end task definitions: preprocessing + model + loss as one fn.

Each task builds ``loss_fn(params, batch, rng) -> scalar`` consumed by
train.step.make_train_step, fusing the reference's
data_preprocess → forward → cal_loss chain (Lightning/main.py:149-157)
into a single XLA program.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from fnssl_tpu.models.fnssl import FNSSLConfig, fnssl_apply
from fnssl_tpu.physics.dpipd import DPIPD
from fnssl_tpu.train.losses import mse_ipd_loss
from fnssl_tpu.train.preprocess import make_fnssl_preprocess

# 2-mic linear array at ±4 cm — the FN-SSL training array
# (Lightning/main.py:121-123).
DUALCH_MIC_LOCATION = np.array([[-0.04, 0.0, 0.0], [0.04, 0.0, 0.0]])


class FNSSLTask(NamedTuple):
    loss_fn: object
    preprocess: object
    cfg: FNSSLConfig
    dpipd: DPIPD


def _wrap_apply(apply_base, remat: bool = False, precision: str = "fp32"):
    """Compose the remat (jax.checkpoint) and compute-precision policies
    around a model apply. Precision goes outermost so rematerialized
    activations are stored in bf16 too."""
    from fnssl_tpu.train.precision import wrap_apply

    fn = apply_base
    if remat:
        import jax as _jax

        def fn(p, x, **kw):  # noqa: F811
            return _jax.checkpoint(
                lambda p_, x_: apply_base(p_, x_, **kw))(p, x)

    return wrap_apply(fn, precision)


def make_fnssl_task(cfg: FNSSLConfig = FNSSLConfig(),
                    mic_location: np.ndarray = DUALCH_MIC_LOCATION,
                    ch_mode: str = "MM", nfft: int = 512,
                    fs: int = 16000, speed: float = 340.0,
                    res_the: int = 37, res_phi: int = 73,
                    remat: bool = False,
                    precision: str = "fp32") -> FNSSLTask:
    """FN-SSL DP-IPD regression task (the flagship model).

    Batch contract: dict with
      'mic_sig' (nb, nsample, nch) float32,
      'doa' (nb, nt2, 2, ns) radians,
      'vad' (nb, nt2, ns) soft VAD at the output frame rate.

    ``remat`` wraps the model apply in ``jax.checkpoint`` — trades one
    extra forward for a much smaller backward program/activation memory
    (and sidesteps compile-service size limits on some backends).
    ``precision='bf16'`` enables the mixed-precision compute policy
    (train/precision.py — the reference's AMP analogue, Learner.py:109-115).
    """
    dpipd = DPIPD(ndoa_candidate=[res_the, res_phi],
                  mic_location=mic_location, nf=nfft // 2 + 1,
                  fre_max=fs / 2, ch_mode=ch_mode, speed=speed)
    preprocess = make_fnssl_preprocess(dpipd, ch_mode=ch_mode, nfft=nfft)
    apply_fn = _wrap_apply(fnssl_apply, remat, precision)

    if cfg.is_doa:
        # azimuth-classification head: CE on integer-degree classes
        # (Learner.py:454-469; truncation matches the LongTensor cast)
        from fnssl_tpu.train.losses import ce_doa_loss

        import jax.numpy as jnp

        def loss_fn(params, batch, rng):
            feats, _ = preprocess(batch["mic_sig"], batch["doa"],
                                  batch["vad"])
            pred = apply_fn(params, feats, cfg=cfg, rng=rng,
                            training=rng is not None)
            azi_deg = batch["doa"][:, :, 1, 0] * (180.0 / jnp.pi)
            labels = jnp.clip(azi_deg.astype(jnp.int32), 0, 179)
            return ce_doa_loss(pred, labels)
    else:
        def loss_fn(params, batch, rng):
            feats, gt = preprocess(batch["mic_sig"], batch["doa"],
                                   batch["vad"])
            pred = apply_fn(params, feats, cfg=cfg, rng=rng,
                            training=rng is not None)
            return mse_ipd_loss(pred, gt["ipd"],
                                nb=batch["mic_sig"].shape[0])

    return FNSSLTask(loss_fn, preprocess, cfg, dpipd)


class IPDnetTask(NamedTuple):
    loss_fn: object
    preprocess: object
    cfg: object
    dpipd: DPIPD


def make_ipdnet_task(cfg=None, mic_location: np.ndarray | None = None,
                     nfft: int = 512, fs: int = 16000,
                     speed: float = 340.0, max_track: int = 2,
                     vad_threshold: float = 0.001,
                     remat: bool = False,
                     precision: str = "fp32") -> IPDnetTask:
    """IPDnet multi-track DP-IPD task with frame-level PIT loss
    (runIPDnetOn.py:80-301).

    Batch contract: dict with
      'mic_sig' (nb, nsample, nch),
      'doa' (nb, nt2, 2, ns) radians,
      'vad' (nb, nt2, ns) soft dp-VAD at the output frame rate.
    """
    from fnssl_tpu.models.ipdnet import IPDnetConfig, ipdnet_apply
    from fnssl_tpu.physics.targets import bessel_nonsource_target
    from fnssl_tpu.train.losses import pit_mse_loss
    from fnssl_tpu.train.preprocess import make_ipdnet_preprocess

    if mic_location is None:
        mic_location = DUALCH_MIC_LOCATION
    if cfg is None:
        cfg = IPDnetConfig(input_size=2 * mic_location.shape[0],
                           max_track=max_track)
    dpipd = DPIPD(ndoa_candidate=[37, 73], mic_location=mic_location,
                  nf=nfft // 2 + 1, fre_max=fs / 2, ch_mode="M",
                  speed=speed)
    nonsource = bessel_nonsource_target(
        mic_location, fre_used=slice(1, nfft // 2 + 1), nf=nfft // 2 + 1,
        fre_max=fs / 2, speed=speed)
    preprocess = make_ipdnet_preprocess(
        dpipd, nonsource, ch_mode="none", nfft=nfft,
        vad_threshold=vad_threshold)
    apply_fn = _wrap_apply(ipdnet_apply, remat, precision)

    def loss_fn(params, batch, rng):
        feats, gt = preprocess(batch["mic_sig"], batch["doa"], batch["vad"])
        pred = apply_fn(params, feats, cfg=cfg, rng=rng,
                        training=rng is not None)
        return pit_mse_loss(pred, gt["ipd"])

    return IPDnetTask(loss_fn, preprocess, cfg, dpipd)


def make_variable_ipdnet_task(cfg=None,
                              mic_location: np.ndarray | None = None,
                              nfft: int = 512, fs: int = 16000,
                              speed: float = 340.0,
                              vad_threshold: float = 0.001,
                              remat: bool = False,
                              precision: str = "fp32") -> IPDnetTask:
    """Variable-array IPDnet task: mic pairs ride the batch axis in
    nb-major pair groups (VariableArrayIPDnet.py:107-118 conventions),
    PIT loss over the 2 tracks against all-pair ('MM') DP-IPD targets.

    Batch contract: dict with 'mic_sig' (nb, nsample, nch),
    'doa' (nb, nt2, 2, ns), 'vad' (nb, nt2, ns) — nb SAME-topology
    utterances batch together (their pair means stay per-utterance);
    one jit trace per array topology, any nb within it.
    """
    from fnssl_tpu.models.ipdnet import (
        VariableIPDnetConfig, variable_ipdnet_apply)
    from fnssl_tpu.physics.targets import bessel_nonsource_target
    from fnssl_tpu.train.losses import pit_mse_loss
    from fnssl_tpu.train.preprocess import make_ipdnet_preprocess

    if mic_location is None:
        mic_location = DUALCH_MIC_LOCATION
    if cfg is None:
        cfg = VariableIPDnetConfig()
    dpipd = DPIPD(ndoa_candidate=[37, 73], mic_location=mic_location,
                  nf=nfft // 2 + 1, fre_max=fs / 2, ch_mode="MM",
                  speed=speed)
    nonsource = bessel_nonsource_target(
        mic_location, fre_used=slice(1, nfft // 2 + 1), nf=nfft // 2 + 1,
        fre_max=fs / 2, speed=speed, ch_mode="MM")
    preprocess = make_ipdnet_preprocess(
        dpipd, nonsource, ch_mode="MM", nfft=nfft,
        vad_threshold=vad_threshold)

    apply_fn = _wrap_apply(variable_ipdnet_apply, remat, precision)
    n = mic_location.shape[0]
    npair = n * (n - 1) // 2

    def loss_fn(params, batch, rng):
        feats, gt = preprocess(batch["mic_sig"], batch["doa"], batch["vad"])
        pred = apply_fn(params, feats, cfg=cfg, rng=rng,
                        training=rng is not None, npair=npair)
        nt = min(pred.shape[1], gt["ipd"].shape[1])
        return pit_mse_loss(pred[:, :nt], gt["ipd"][:, :nt])

    return IPDnetTask(loss_fn, preprocess, cfg, dpipd)


def make_ipdnet_offline_task(cfg=None,
                             mic_location: np.ndarray | None = None,
                             nfft: int = 512, fs: int = 16000,
                             speed: float = 340.0, max_track: int = 2,
                             vad_threshold: float = 0.001,
                             remat: bool = False,
                             precision: str = "fp32") -> IPDnetTask:
    """Offline IPDnet variant (runIPDnetOff.py:79-303): bidirectional
    narrow LSTMs, *global* magnitude normalization instead of the
    forgetting norm, and chunked offline inference at test time.
    """
    from fnssl_tpu.models.ipdnet import IPDnetConfig, ipdnet_apply
    from fnssl_tpu.physics.targets import bessel_nonsource_target
    from fnssl_tpu.train.losses import pit_mse_loss
    from fnssl_tpu.train.preprocess import make_ipdnet_preprocess

    if mic_location is None:
        mic_location = DUALCH_MIC_LOCATION
    if cfg is None:
        cfg = IPDnetConfig(input_size=2 * mic_location.shape[0],
                           max_track=max_track, is_online=False)
    dpipd = DPIPD(ndoa_candidate=[37, 73], mic_location=mic_location,
                  nf=nfft // 2 + 1, fre_max=fs / 2, ch_mode="M",
                  speed=speed)
    nonsource = bessel_nonsource_target(
        mic_location, fre_used=slice(1, nfft // 2 + 1), nf=nfft // 2 + 1,
        fre_max=fs / 2, speed=speed)
    # offline global-mean normalization (runIPDnetOff.py:249-251)
    import jax as _jax

    base = make_ipdnet_preprocess(dpipd, nonsource, ch_mode="none",
                                  nfft=nfft, vad_threshold=vad_threshold)

    @_jax.jit
    def preprocess(mic_sig, doa, vad):
        from fnssl_tpu.train.preprocess import stft_features
        feats = stft_features(mic_sig, ch_mode="none", nfft=nfft,
                              norm="offline")
        _, gt = base(mic_sig, doa, vad)
        return feats, gt

    apply_fn = _wrap_apply(ipdnet_apply, remat, precision)

    def loss_fn(params, batch, rng):
        feats, gt = preprocess(batch["mic_sig"], batch["doa"], batch["vad"])
        pred = apply_fn(params, feats, cfg=cfg, rng=rng,
                        training=rng is not None)
        return pit_mse_loss(pred, gt["ipd"])

    return IPDnetTask(loss_fn, preprocess, cfg, dpipd)


def make_ipdnet2_task(cfg=None, mic_location: np.ndarray | None = None,
                      nfft: int = 512, fs: int = 16000,
                      speed: float = 340.0, remat: bool = False,
                      precision: str = "fp32", feats_sharding=None):
    """IPDnet2/OnlineSpatialNet near-field task (run_IPDnet2.py:82-339):
    STFT center=True hop 0.625, forgetting-norm L=249, per-batch array
    topology near-field DP-IPD targets (DPIPD2), Bessel non-source fill,
    frame-level PIT-MSE. Unlike the reference — which rebuilds the numpy
    DPIPD2 template every training step (run_IPDnet2.py:271-276) — the
    target function is jit-compiled once and takes the topology as data.

    Batch contract: dict with
      'mic_sig' (nb, nsample, nch),
      'azi_deg' (nb, nt2, ns) azimuth targets in degrees (10 Hz stream),
      'distance' (nb, nt2, ns) meters,
      'vad' (nb, nt2, ns),
      'mic_pos' (nb, nmic, 3) per-batch topology.

    ``feats_sharding``: optional ``jax.sharding.NamedSharding`` for the
    post-STFT feature tensor (nb, 2·nmic, nf, nt). Constraining it to a
    2-D (data × freq) mesh — e.g. ``P('data', None, 'freq', None)`` —
    makes XLA's SPMD partitioner shard the whole narrow-band network
    over frequency for forward AND backward (halo exchange for the
    grouped freq convs, gather for the full-band module, grad psum over
    both axes — all inserted from this one annotation). This is the
    beyond-DDP axis the reference cannot express (SURVEY §2.9).
    """
    from fnssl_tpu.models.spatialnet import (
        SpatialNetConfig, spatialnet_apply)
    from fnssl_tpu.physics.dpipd import DPIPD2
    from fnssl_tpu.physics.targets import (
        bessel_nonsource_target, vad_gate_with_nonsource)
    from fnssl_tpu.train.losses import pit_mse_loss
    from fnssl_tpu.train.preprocess import stft_features

    import jax
    import jax.numpy as jnp

    if mic_location is None:
        # 5-mic subset of the Westlake 32-mic array (RealMAN training)
        from fnssl_tpu.data.arrays import audiowu_high_array_geometry
        mic_location = audiowu_high_array_geometry()[[0, 1, 3, 5, 7]]
    nmic = mic_location.shape[0]
    if cfg is None:
        cfg = SpatialNetConfig(dim_input=2 * nmic,
                               dim_output=4 * (nmic - 1))
    dpipd2 = DPIPD2(ndoa_candidate=[1, 180], mic_location=mic_location,
                    nf=nfft // 2 + 1, fre_max=fs / 2, ch_mode="M",
                    speed=speed)
    nonsource = bessel_nonsource_target(
        mic_location, fre_used=slice(1, nfft // 2 + 1), nf=nfft // 2 + 1,
        fre_max=fs / 2, speed=speed)
    nonsource_j = np.asarray(nonsource, np.float32)
    fre_used = slice(1, nfft // 2 + 1)

    @jax.jit
    def preprocess(mic_sig, azi_deg, distance, vad, mic_pos):
        feats = stft_features(mic_sig, ch_mode="none", win_len=nfft,
                              win_shift_ratio=0.625, nfft=nfft,
                              center=True, sample_length=249)
        ele = jnp.full_like(azi_deg, 90.0)
        doa = jnp.stack([ele, azi_deg], axis=2) * (jnp.pi / 180.0)
        ipd = dpipd2.targets(doa, distance, mic_pos)
        ipd = jnp.concatenate(
            [jnp.real(ipd[:, :, fre_used]), jnp.imag(ipd[:, :, fre_used])],
            axis=2).astype(jnp.float32)
        gt_ipd = vad_gate_with_nonsource(ipd, vad, nonsource_j,
                                         threshold=0.0)
        return feats, {"ipd": gt_ipd}

    apply_fn = _wrap_apply(spatialnet_apply, remat, precision)

    def loss_fn(params, batch, rng):
        feats, gt = preprocess(batch["mic_sig"], batch["azi_deg"],
                               batch["distance"], batch["vad"],
                               batch["mic_pos"])
        if feats_sharding is not None:
            feats = jax.lax.with_sharding_constraint(feats, feats_sharding)
        pred = apply_fn(params, feats, cfg=cfg)
        # reconcile pred/gt frame counts (run_IPDnet2.py:183-189)
        nt = min(pred.shape[1], gt["ipd"].shape[1])
        return pit_mse_loss(pred[:, :nt], gt["ipd"][:, :nt])

    return IPDnetTask(loss_fn, preprocess, cfg, dpipd2)


def synthetic_fnssl_batch(nb: int = 2, t_s: float = 4.79, fs: int = 16000,
                          nch: int = 2, ns: int = 1, seed: int = 0,
                          win_len: int = 512, win_shift_ratio: float = 0.5,
                          pool: int = 12):
    """Random batch matching the FN-SSL data contract (for smoke/bench)."""
    from fnssl_tpu.core.stft import num_frames

    rng = np.random.default_rng(seed)
    nsample = int(t_s * fs)
    nt = num_frames(nsample, win_len, win_shift_ratio, center=False)
    nt2 = nt // pool
    return {
        "mic_sig": rng.standard_normal((nb, nsample, nch)).astype(np.float32),
        "doa": np.stack([
            np.full((nb, nt2, ns), np.pi / 2, np.float32),
            rng.uniform(-np.pi, np.pi, (nb, nt2, ns)).astype(np.float32),
        ], axis=2),
        "vad": np.ones((nb, nt2, ns), np.float32),
    }
