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
