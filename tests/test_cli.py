"""CLI smoke: the full simulate→fit→test→predict lifecycle in-process."""
import json
import os

import numpy as np
import pytest

from fnssl_tpu.cli.main import main


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    os.chdir(d)
    return d


def test_cli_lifecycle(workdir, capsys):
    main(["simulate", "--out", "data/train", "--num", "3", "--T", "0.5",
          "--nb-points", "4", "--seed", "1"])
    main(["simulate", "--out", "data/dev", "--num", "2", "--T", "0.5",
          "--nb-points", "4", "--seed", "77"])
    capsys.readouterr()
    main(["fit", "--model", "fnssl", "--train-dir", "data/train",
          "--valid-dir", "data/dev", "--epochs", "1", "--bz", "1",
          "--log-dir", "runs/t"])
    out = capsys.readouterr().out
    result = json.loads(out.strip().splitlines()[-1])
    assert np.isfinite(result["final_valid"])
    assert os.path.exists("runs/t/ckpt")
    assert os.path.exists("runs/t/config.json")

    main(["test", "--model", "fnssl", "--data-dir", "data/dev",
          "--bz", "1", "--log-dir", "runs/t"])
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(metrics["loss"] - result["final_valid"]) < 1e-6  # restored

    main(["predict", "--model", "fnssl", "--wav", "data/dev/0.wav",
          "--log-dir", "runs/t", "--out", "pred/"])
    pred = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists("pred/doa_est.npy")
    assert pred["frames"] >= 1

    # chunked streaming serving over the same wav + checkpoint: outputs
    # fire per 12 buffered frames regardless of the 100 ms push size
    main(["stream", "--model", "fnssl", "--wav", "data/dev/0.wav",
          "--chunk-ms", "100", "--log-dir", "runs/t", "--out", "stream/"])
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["out_frames"] >= 1 and st["rtf"] > 0
    doa = np.load("stream/doa_est.npy")
    assert doa.shape[0] == st["out_frames"]
    assert np.isfinite(doa).all()


def test_cli_fit_wires_epoch_length_into_schedule(workdir, monkeypatch):
    """Regression: the γ^epoch lr decay must step at epoch boundaries —
    cmd_fit has to pass the dataset's steps/epoch to the optimizer, or
    a 500-step epoch decays the lr 500 times (it collapsed to ~0 after
    one epoch at scale)."""
    captured = {}
    import fnssl_tpu.cli.main as cli_main
    import fnssl_tpu.train.learner as learner_mod

    real_init = learner_mod.Learner.__init__

    def spy_init(self, *a, **kw):
        captured.update(kw)
        real_init(self, *a, **kw)

    monkeypatch.setattr(learner_mod.Learner, "__init__", spy_init)
    if not os.path.exists("data/train"):
        main(["simulate", "--out", "data/train", "--num", "3", "--T",
              "0.5", "--nb-points", "4", "--seed", "1"])
        main(["simulate", "--out", "data/dev", "--num", "2", "--T",
              "0.5", "--nb-points", "4", "--seed", "77"])
    main(["fit", "--model", "fnssl", "--train-dir", "data/train",
          "--valid-dir", "data/dev", "--epochs", "1", "--bz", "1",
          "--log-dir", "runs/spe"])
    assert captured.get("steps_per_epoch") == 3  # 3 scenes, bz 1


def test_cli_stream_ipdnet2(workdir, capsys):
    """The flagship streams through the CLI serving loop too: 5-ch wav →
    center=True front-end → stateful OnlineSpatialNet chunk steps →
    per-track near-field decode."""
    from fnssl_tpu.utils.audio_io import write_audio

    sig = np.random.default_rng(9).standard_normal(
        (8000, 5)).astype(np.float32) * 0.1
    write_audio("five_ch.wav", sig, 16000)
    capsys.readouterr()
    main(["stream", "--model", "ipdnet2", "--wav", "five_ch.wav",
          "--chunk-ms", "200", "--log-dir", "runs/ip2s", "--out",
          "st_ip2/"])
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["out_frames"] >= 1
    doa = np.load("st_ip2/doa_est.npy")
    assert doa.ndim == 3 and doa.shape[-1] == 2      # 2 tracks
    assert np.isfinite(doa).all()

    # one-shot predict over the same wav (same decode, whole-utterance)
    main(["predict", "--model", "ipdnet2", "--wav", "five_ch.wav",
          "--log-dir", "runs/ip2s", "--out", "pred_ip2/"])
    pr = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pr["frames"] >= st["out_frames"] and pr["tracks"] == 2


def test_cli_predict_ipd_baseline(workdir, capsys):
    """The DNN-free classical path (wDNN=False, Learner.py:208-214)
    runs straight from a wav with no checkpoint."""
    if not os.path.exists("data/dev"):
        main(["simulate", "--out", "data/dev", "--num", "2", "--T",
              "0.5", "--nb-points", "4", "--seed", "77"])
    capsys.readouterr()
    main(["predict", "--model", "ipd_baseline", "--wav", "data/dev/0.wav",
          "--out", "pred_base/"])
    pred = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pred["frames"] >= 1
    doa = np.load("pred_base/doa_est.npy")
    assert np.isfinite(doa).all()
    # fit/test with the model-free baseline is a clean, explicit error
    with pytest.raises(SystemExit, match="model-free"):
        main(["fit", "--model", "ipd_baseline", "--train-dir", "data/dev",
              "--valid-dir", "data/dev", "--epochs", "1",
              "--log-dir", "runs/nope"])


def test_cli_ipdnet2_realman_fit_test(workdir, capsys, rng):
    """The flagship's full CLI lifecycle on RealMAN-layout data: fit
    (AdamW, fused near-field targets) then test with Hungarian-matched
    multi-track metrics — run_IPDnet2.py fit/test through one CLI."""
    from fnssl_tpu.utils.audio_io import write_audio

    fs, nch = 16000, 9
    ma, dp, nz = "rm/ma_speech", "rm/dp_speech", "rm/noise"
    for d in (ma, dp, nz):
        os.makedirs(d, exist_ok=True)
    rows = ["filename,angle(°),distance"]
    for rec in range(2):
        base = rng.standard_normal(int(4.5 * fs)).astype(np.float32) * 0.3
        for ch in range(nch):
            write_audio(f"{ma}/r{rec}_CH{ch}.wav", base * (1 + 0.01 * ch),
                        fs)
        write_audio(f"{dp}/r{rec}.wav", base, fs)
        rows.append(f"r{rec}.wav,{30.0 + rec},1.5")
    open("rm/targets.csv", "w").write("\n".join(rows) + "\n")
    noise = rng.standard_normal(int(5 * fs)).astype(np.float32) * 0.1
    for ch in range(nch):
        write_audio(f"{nz}/amb_CH{ch}.wav", noise, fs)

    capsys.readouterr()
    main(["fit", "--model", "ipdnet2", "--train-dir", ma + "/",
          "--valid-dir", ma + "/", "--realman-csv", "rm/targets.csv",
          "--realman-noise", nz, "--realman-ext", "wav",
          "--epochs", "1", "--bz", "1", "--log-dir", "runs/rm"])
    fit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(fit["final_valid"])

    main(["test", "--model", "ipdnet2", "--data-dir", ma + "/",
          "--realman-csv", "rm/targets.csv", "--realman-noise", nz,
          "--realman-ext", "wav", "--bz", "1", "--log-dir", "runs/rm"])
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(metrics["loss"] - fit["final_valid"]) < 1e-5   # restored
    for k in ("ACC", "MAE", "MDR", "FAR"):
        assert k in metrics and np.isfinite(metrics[k])


def test_cli_fit_wires_stall_watchdog(workdir, monkeypatch):
    """--stall-restart-s must reach Learner.fit as stall_timeout_s with
    a re-exec action (the wedged-tunnel recovery path)."""
    captured = {}
    import fnssl_tpu.train.learner as learner_mod

    real_fit = learner_mod.Learner.fit

    def spy_fit(self, *a, **kw):
        captured.update(kw)
        return real_fit(self, *a, **kw)

    monkeypatch.setattr(learner_mod.Learner, "fit", spy_fit)
    if not os.path.exists("data/train"):
        main(["simulate", "--out", "data/train", "--num", "3", "--T",
              "0.5", "--nb-points", "4", "--seed", "1"])
        main(["simulate", "--out", "data/dev", "--num", "2", "--T",
              "0.5", "--nb-points", "4", "--seed", "77"])
    main(["fit", "--model", "fnssl", "--train-dir", "data/train",
          "--valid-dir", "data/dev", "--epochs", "1", "--bz", "1",
          "--log-dir", "runs/wd", "--stall-restart-s", "900"])
    assert captured.get("stall_timeout_s") == 900.0
    assert callable(captured.get("stall_action"))
    # default: watchdog off (no timeout above the 600 s worst compile
    # can be assumed for the user)
    captured.clear()
    main(["fit", "--model", "fnssl", "--train-dir", "data/train",
          "--valid-dir", "data/dev", "--epochs", "1", "--bz", "1",
          "--log-dir", "runs/wd2"])
    assert captured.get("stall_timeout_s") is None


def test_cli_ipdnet_offline_fit(workdir, capsys):
    """The offline IPDnet variant (bidirectional narrow LSTMs, global
    norm, runIPDnetOff.py) trains and restores via the CLI."""
    if not os.path.exists("data/train"):
        main(["simulate", "--out", "data/train", "--num", "3", "--T",
              "0.5", "--nb-points", "4", "--seed", "1"])
        main(["simulate", "--out", "data/dev", "--num", "2", "--T",
              "0.5", "--nb-points", "4", "--seed", "77"])
    capsys.readouterr()
    main(["fit", "--model", "ipdnet_offline", "--train-dir", "data/train",
          "--valid-dir", "data/dev", "--epochs", "1", "--bz", "1",
          "--log-dir", "runs/off"])
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(result["final_valid"])
    main(["test", "--model", "ipdnet_offline", "--data-dir", "data/dev",
          "--bz", "1", "--log-dir", "runs/off"])
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(metrics["loss"] - result["final_valid"]) < 1e-6
    assert "ACC" in metrics and "MAE" in metrics   # chunked-decode eval


def test_cli_shipped_config_presets(workdir, capsys, monkeypatch):
    """The shipped configs/ presets load through --config; explicit CLI
    flags still override them."""
    import pathlib

    repo = pathlib.Path(__file__).resolve().parents[1]
    if not os.path.exists("data/train"):
        main(["simulate", "--out", "data/train", "--num", "3", "--T",
              "0.5", "--nb-points", "4", "--seed", "1"])
    capsys.readouterr()
    main(["fit", "--config", str(repo / "configs" / "fnssl.yaml"),
          "--train-dir", "data/train", "--valid-dir", "data/train",
          "--epochs", "1", "--bz", "1", "--precision", "fp32",
          "--log-dir", "runs/cfg"])
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(result["final_valid"])
    snap = json.load(open("runs/cfg/config.json"))
    assert snap["model"] == "fnssl" and snap["epochs"] == 1  # override
    assert snap["early_stop_patience"] == 10                 # preset
    # every shipped preset parses and its keys are real CLI dests
    import yaml
    from fnssl_tpu.cli.main import build_parser
    ap = build_parser()
    fit = next(a for a in ap._subparsers._group_actions[0].choices.values()
               if any(x.dest == "train_dir" for x in a._actions))
    dests = {a.dest for a in fit._actions}
    for cfg in (repo / "configs").glob("*.yaml"):
        keys = yaml.safe_load(cfg.read_text())
        unknown = set(keys) - dests
        assert not unknown, f"{cfg.name}: unknown keys {unknown}"


def test_cli_ipdnet_lifecycle(workdir, capsys):
    """Online multi-track IPDnet through fit/test/predict/stream (the
    family of the r3 scale run, previously only covered at scale)."""
    if not os.path.exists("data/train"):
        main(["simulate", "--out", "data/train", "--num", "3", "--T",
              "0.5", "--nb-points", "4", "--seed", "1"])
        main(["simulate", "--out", "data/dev", "--num", "2", "--T",
              "0.5", "--nb-points", "4", "--seed", "77"])
    capsys.readouterr()
    main(["fit", "--model", "ipdnet", "--train-dir", "data/train",
          "--valid-dir", "data/dev", "--epochs", "1", "--bz", "1",
          "--log-dir", "runs/ipd"])
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(result["final_valid"])
    main(["test", "--model", "ipdnet", "--data-dir", "data/dev",
          "--bz", "1", "--log-dir", "runs/ipd"])
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(metrics["loss"] - result["final_valid"]) < 1e-5
    assert "ACC" in metrics
    main(["predict", "--model", "ipdnet", "--wav", "data/dev/0.wav",
          "--log-dir", "runs/ipd", "--out", "pred_ipd/"])
    pred = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pred["tracks"] == 2
    main(["stream", "--model", "ipdnet", "--wav", "data/dev/0.wav",
          "--log-dir", "runs/ipd", "--out", "st_ipd/"])
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["out_frames"] >= 1
    doa = np.load("st_ipd/doa_est.npy")
    assert doa.shape[-1] == 2 and np.isfinite(doa).all()


def test_cli_fnssl_doa_lifecycle(workdir, capsys):
    """Regression: the classification head decodes via argmax-class
    (predgt2doa_cls), not the IPD grid decoder — cli test used to crash
    reshaping 180-class logits into the 512-dim template."""
    if not os.path.exists("data/train"):
        main(["simulate", "--out", "data/train", "--num", "3", "--T",
              "0.5", "--nb-points", "4", "--seed", "1"])
        main(["simulate", "--out", "data/dev", "--num", "2", "--T",
              "0.5", "--nb-points", "4", "--seed", "77"])
    capsys.readouterr()
    main(["fit", "--model", "fnssl_doa", "--train-dir", "data/train",
          "--valid-dir", "data/dev", "--epochs", "1", "--bz", "1",
          "--log-dir", "runs/doa"])
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(result["final_valid"])
    main(["test", "--model", "fnssl_doa", "--data-dir", "data/dev",
          "--bz", "1", "--log-dir", "runs/doa"])
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(metrics["loss"] - result["final_valid"]) < 1e-5
    assert "ACC" in metrics and np.isfinite(metrics["MAE"])
    main(["predict", "--model", "fnssl_doa", "--wav", "data/dev/0.wav",
          "--log-dir", "runs/doa", "--out", "pred_doa/"])
    pred = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pred["frames"] >= 1
    main(["stream", "--model", "fnssl_doa", "--wav", "data/dev/0.wav",
          "--log-dir", "runs/doa", "--out", "st_doa/"])
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["out_frames"] >= 1
    assert np.isfinite(np.load("st_doa/doa_est.npy")).all()


def test_cli_variable_ipdnet_fit_test(workdir, capsys):
    """Variable-array IPDnet through fit/test with multi-track metrics
    (pairs on the batch axis, all-pair template decode)."""
    if not os.path.exists("data/train"):
        main(["simulate", "--out", "data/train", "--num", "3", "--T",
              "0.5", "--nb-points", "4", "--seed", "1"])
        main(["simulate", "--out", "data/dev", "--num", "2", "--T",
              "0.5", "--nb-points", "4", "--seed", "77"])
    capsys.readouterr()
    main(["fit", "--model", "variable_ipdnet", "--train-dir",
          "data/train", "--valid-dir", "data/dev", "--epochs", "1",
          "--bz", "1", "--log-dir", "runs/var"])
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(result["final_valid"])
    main(["test", "--model", "variable_ipdnet", "--data-dir", "data/dev",
          "--bz", "1", "--log-dir", "runs/var"])
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(metrics["loss"] - result["final_valid"]) < 1e-6
    assert "ACC" in metrics and np.isfinite(metrics["MAE"])


def test_cli_fit_rss_restart_execs_with_resume(workdir, monkeypatch,
                                               capsys):
    """cmd_fit re-execs itself with --resume appended when the learner
    reports the RSS limit was hit (the axon transfer-leak workaround)."""
    import fnssl_tpu.train.learner as learner_mod

    monkeypatch.setattr(learner_mod, "process_rss_gb", lambda: 999.0)
    captured = {}
    monkeypatch.setattr(
        os, "execv", lambda exe, argv: captured.update(argv=argv))
    if not os.path.exists("data/train"):
        main(["simulate", "--out", "data/train", "--num", "3", "--T",
              "0.5", "--nb-points", "4", "--seed", "1"])
        main(["simulate", "--out", "data/dev", "--num", "2", "--T",
              "0.5", "--nb-points", "4", "--seed", "77"])

    argv = ["fit", "--model", "fnssl", "--train-dir", "data/train",
            "--valid-dir", "data/dev", "--epochs", "2", "--bz", "1",
            "--log-dir", "runs/rss", "--rss-restart-gb", "10"]
    main(argv)
    capsys.readouterr()
    assert captured, "os.execv was not invoked"
    exec_argv = captured["argv"]
    assert exec_argv[1:3] == ["-m", "fnssl_tpu.cli"]
    assert exec_argv[-1] == "--resume"

    # the restarted command parses and resumes cleanly (limit disabled)
    restart = list(exec_argv[3:])
    restart[restart.index("--rss-restart-gb") + 1] = "0"
    main(restart)
    out = capsys.readouterr().out
    assert "resumed from epoch 0" in out


def test_eval_never_drops_samples(workdir):
    """Eval loaders keep every sample (VERDICT r4 #8 follow-up: the
    4-way-world valid NaN). Dynamic shapes keep the ragged tail batch;
    static worlds (mesh / multi-process) wrap-pad to a bz multiple so
    every rank yields equal full-size batches."""
    from fnssl_tpu.cli.main import _batches, _eval_schedule

    # unit: schedule semantics
    sched = [(0, 10), (1, 11), (2, 12)]
    dyn, drop = _eval_schedule(sched, 2, static_shapes=False)
    assert dyn == sched and drop is False
    padded, drop = _eval_schedule(sched, 2, static_shapes=True)
    assert padded == sched + [sched[0]] and drop is True
    exact, drop = _eval_schedule(sched[:2], 2, static_shapes=True)
    assert exact == sched[:2] and drop is True
    one, drop = _eval_schedule(sched[:1], 4, static_shapes=True)
    assert one == [sched[0]] * 4 and drop is True       # wraps repeatedly
    empty, _ = _eval_schedule([], 4, static_shapes=True)
    assert empty == []

    # integration: 3 scenes, bz 2 — eval yields 2 batches (2+1 rows
    # dynamic; 2+2 with a wrapped duplicate under static shapes), train
    # keeps the fixed-shape drop_last contract (1 batch)
    if not os.path.exists("data/train"):
        main(["simulate", "--out", "data/train", "--num", "3", "--T",
              "0.5", "--nb-points", "4", "--seed", "1"])
    rows = lambda b: b["mic_sig"].shape[0] if "mic_sig" in b else \
        next(iter(b.values())).shape[0]
    dyn_batches = list(_batches("data/train", 2, 0, 2, False, workers=0))
    assert [rows(b) for b in dyn_batches] == [2, 1]
    stat_batches = list(_batches("data/train", 2, 0, 2, False, workers=0,
                                 static_shapes=True))
    assert [rows(b) for b in stat_batches] == [2, 2]
    train_batches = list(_batches("data/train", 2, 0, 2, True, workers=0))
    assert [rows(b) for b in train_batches] == [2]
