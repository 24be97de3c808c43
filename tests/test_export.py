"""Serving-artifact export (runtime/export.py): StableHLO + weight
bundle round-trips for every model family, forward and stream modes.

The reference has no export/serialization story — serving it requires
the full model source tree (FN-SSL/Predict.py rebuilds the nn.Module
before load_state_dict). Here the artifact is the compiler IR itself,
and loading needs no model code.
"""
import json
import os

import jax
import numpy as np
import pytest

from fnssl_tpu.runtime.export import (export_model, load_artifact,
                                      load_params_npz, save_params_npz)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def _fnssl():
    from fnssl_tpu.models.fnssl import (FNSSLConfig, fnssl_apply,
                                        init_fnssl_params)
    cfg = FNSSLConfig()
    params = init_fnssl_params(jax.random.PRNGKey(0), cfg)
    return params, lambda p, x: fnssl_apply(p, x, cfg=cfg)


def test_params_npz_roundtrip(tmp_path, rng):
    """Nested dict / list / tuple / NamedTuple / bf16 leaves all survive
    the npz + JSON-skeleton encoding exactly."""
    from fnssl_tpu.models.lstm import LSTMState

    tree = {
        "a": rng.standard_normal((3, 4)).astype(np.float32),
        "layers": [{"w": rng.standard_normal(5).astype(np.float32)}
                   for _ in range(2)],
        "pair": (np.int32(3) * np.ones(2, np.int32),
                 rng.standard_normal(2).astype(np.float16)),
        "state": LSTMState(h=np.zeros((1, 4), np.float32),
                           c=np.ones((1, 4), np.float32)),
        "bf16": jax.numpy.ones((2, 2), jax.numpy.bfloat16),
    }
    skel = save_params_npz(str(tmp_path / "p.npz"), tree)
    json.dumps(skel)                       # must be JSON-serializable
    back = load_params_npz(str(tmp_path / "p.npz"), skel)
    assert isinstance(back["pair"], tuple)
    assert isinstance(back["state"], LSTMState)
    assert str(back["bf16"].dtype) == "bfloat16"
    for want, got in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(want, np.float32),
                                      np.asarray(got, np.float32))


def test_forward_artifact_matches_direct_apply(tmp_path, rng):
    params, apply_fn = _fnssl()
    feats = rng.standard_normal((2, 4, 256, 24)).astype(np.float32)
    meta = export_model("fnssl", params, feats, str(tmp_path / "art"))
    m = load_artifact(str(tmp_path / "art"))
    np.testing.assert_allclose(np.asarray(m(feats)),
                               np.asarray(apply_fn(params, feats)),
                               rtol=1e-6, atol=1e-6)
    assert meta["mode"] == "forward"
    for f in ("model.hlo", "params.npz", "meta.json"):
        assert os.path.exists(tmp_path / "art" / f)


def test_stream_artifact_chunked_equals_oneshot(tmp_path, rng):
    """The exported chunk step carries state: two 12-frame chunks must
    reproduce the one-shot 24-frame forward (the streaming≡offline
    invariant, now across serialization)."""
    params, apply_fn = _fnssl()
    feats = rng.standard_normal((1, 4, 256, 24)).astype(np.float32)
    export_model("fnssl", params, feats[..., :12], str(tmp_path / "art"),
                 mode="stream")
    m = load_artifact(str(tmp_path / "art"))
    o = np.concatenate([np.asarray(m(feats[..., :12])),
                        np.asarray(m(feats[..., 12:]))], axis=1)
    np.testing.assert_allclose(o, np.asarray(apply_fn(params, feats)),
                               rtol=1e-5, atol=1e-5)
    m.reset()                             # restart reproduces chunk 1
    np.testing.assert_array_equal(np.asarray(m(feats[..., :12])), o[:, :1])


def test_ipdnet2_stream_artifact(tmp_path, rng):
    """OnlineSpatialNet exports with its full state bundle (Mamba ssm +
    conv + norm carries)."""
    from fnssl_tpu.models.spatialnet import (SpatialNetConfig,
                                             init_spatialnet_params,
                                             init_spatialnet_state,
                                             spatialnet_apply)
    cfg = SpatialNetConfig()           # export resolves the default cfg
    params = init_spatialnet_params(jax.random.PRNGKey(0), cfg)
    feats = rng.standard_normal(
        (1, cfg.dim_input, cfg.num_freqs, 5)).astype(np.float32)
    export_model("ipdnet2", params, feats, str(tmp_path / "art"),
                 mode="stream")
    m = load_artifact(str(tmp_path / "art"))
    o1 = np.asarray(m(feats))
    want, _ = spatialnet_apply(params, feats, cfg=cfg,
                               state=init_spatialnet_state(1, cfg),
                               return_state=True)
    np.testing.assert_allclose(o1, np.asarray(want), rtol=1e-5, atol=1e-5)


def test_variable_ipdnet_forward_export(tmp_path, rng):
    """The array-agnostic variant exports forward-only (pairs on the
    batch axis); stream mode is a clean error for stateless variants."""
    from fnssl_tpu.models.ipdnet import (VariableIPDnetConfig,
                                         init_variable_ipdnet_params,
                                         variable_ipdnet_apply)
    cfg = VariableIPDnetConfig()
    params = init_variable_ipdnet_params(jax.random.PRNGKey(0), cfg)
    feats = rng.standard_normal((3, 4, 256, 12)).astype(np.float32)
    export_model("variable_ipdnet", params, feats, str(tmp_path / "art"))
    m = load_artifact(str(tmp_path / "art"))
    np.testing.assert_allclose(
        np.asarray(m(feats)),
        np.asarray(variable_ipdnet_apply(params, feats, cfg=cfg)),
        rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError, match="no causal streaming"):
        export_model("variable_ipdnet", params, feats,
                     str(tmp_path / "art2"), mode="stream")


def test_multiplatform_export_declares_both(tmp_path, rng):
    """platforms=[cpu,tpu] cross-lowers one artifact for both backends
    (scan LSTM path — trace-time Pallas dispatch is disabled); it must
    still run correctly on the CPU side."""
    params, apply_fn = _fnssl()
    feats = rng.standard_normal((1, 4, 256, 12)).astype(np.float32)
    meta = export_model("fnssl", params, feats, str(tmp_path / "art"),
                        platforms=["cpu", "tpu"])
    assert sorted(meta["platforms"]) == ["cpu", "tpu"]
    m = load_artifact(str(tmp_path / "art"))
    np.testing.assert_allclose(np.asarray(m(feats)),
                               np.asarray(apply_fn(params, feats)),
                               rtol=1e-6, atol=1e-6)


def test_cli_export_after_fit(tmp_path, monkeypatch, capsys):
    """cli export picks up the trained checkpoint and writes a loadable
    artifact whose outputs match the in-process model."""
    from fnssl_tpu.cli.main import main

    monkeypatch.chdir(tmp_path)
    main(["simulate", "--out", "data/train", "--num", "2", "--T", "0.5",
          "--nb-points", "4", "--seed", "3"])
    main(["fit", "--model", "fnssl", "--train-dir", "data/train",
          "--valid-dir", "data/train", "--epochs", "1", "--bz", "1",
          "--log-dir", "runs/e"])
    capsys.readouterr()
    main(["export", "--model", "fnssl", "--log-dir", "runs/e",
          "--out", "art", "--mode", "stream"])
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["epoch"] == 1 and info["mode"] == "stream"

    m = load_artifact("art")
    feats = np.random.default_rng(1).standard_normal(
        (1, 4, 256, 12)).astype(np.float32)
    out = np.asarray(m(feats))
    assert out.shape[0] == 1 and np.isfinite(out).all()

    # the artifact weights are the *trained* ones, not init: compare
    # against the checkpoint restored through the normal path
    from fnssl_tpu.models.fnssl import fnssl_apply
    from fnssl_tpu.train.learner import Learner
    from fnssl_tpu.train.tasks import make_fnssl_task
    task = make_fnssl_task()
    from fnssl_tpu.models.fnssl import init_fnssl_params
    lrn = Learner(task.loss_fn, init_fnssl_params(jax.random.PRNGKey(0),
                                                  task.cfg),
                  log_dir="runs/e")
    lrn.resume()
    from fnssl_tpu.models.fnssl import init_fnssl_state
    want, _ = fnssl_apply(lrn.state.params, feats, cfg=task.cfg,
                          state=init_fnssl_state(1, 256, task.cfg),
                          return_state=True)
    np.testing.assert_allclose(out, np.asarray(want), rtol=1e-5, atol=1e-5)
    lrn.close()

    # serve the SAME wav through the artifact and through the
    # checkpoint path: identical DOA track (model code never runs in
    # the artifact case — the StableHLO chunk step is the model)
    main(["stream", "--model", "fnssl", "--wav", "data/train/0.wav",
          "--log-dir", "runs/e", "--out", "st_ckpt/"])
    capsys.readouterr()
    main(["stream", "--wav", "data/train/0.wav", "--artifact", "art",
          "--log-dir", "runs/e", "--out", "st_art/"])
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["out_frames"] >= 1
    np.testing.assert_allclose(np.load("st_art/doa_est.npy"),
                               np.load("st_ckpt/doa_est.npy"),
                               rtol=1e-4, atol=1e-3)
