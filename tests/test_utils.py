"""Utils coverage: FLOPs harness, metric logging, EMA, NaN guard."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from fnssl_tpu.utils import (
    EmaLoss, MetricLogger, cost_analysis, count_params, detect_infnan,
    flops_forward_backward, set_seed, time_fn, write_flops)


def test_cost_analysis_matmul():
    a = jnp.ones((64, 32))
    b = jnp.ones((32, 16))
    cost = cost_analysis(lambda x, y: x @ y, a, b)
    # 2·M·N·K FLOPs
    assert cost["flops"] == 2 * 64 * 32 * 16


def test_write_flops_schema(tmp_path):
    params = {"w": jnp.ones((8, 8))}

    def apply_fn(p, x):
        return x @ p["w"]

    x = jnp.ones((4, 8))
    stats = write_flops(apply_fn, params, x, str(tmp_path))
    assert count_params(params) == 64
    assert stats["params"] == 64
    assert stats["flops_forward"] > 0
    import yaml
    with open(tmp_path / "FLOPs.yaml") as f:
        loaded = yaml.safe_load(f)
    for key in ("flops_forward", "flops_backward", "params", "fs",
                "audio_time_len", "num_chns"):
        assert key in loaded, key


def test_metric_logger_jsonl(tmp_path):
    logger = MetricLogger(str(tmp_path), use_tensorboard=False)
    logger.log("train/loss", 0.5, 1)
    logger.log_dict({"ACC": 0.9, "MAE": 3.0}, 2, prefix="valid/")
    logger.close()
    lines = [json.loads(line) for line in
             open(tmp_path / "metrics.jsonl")]
    assert lines[0] == {**lines[0], "tag": "train/loss", "value": 0.5,
                        "step": 1}
    assert {ln["tag"] for ln in lines} == {"train/loss", "valid/ACC",
                                           "valid/MAE"}


def test_ema_bias_correction():
    ema = EmaLoss(beta=0.9)
    assert ema.update(1.0) == 1.0  # bias-corrected first value
    v = ema.update(0.0)
    assert 0.4 < v < 0.6


def test_detect_infnan_and_seed():
    assert not detect_infnan(np.ones(3))
    assert detect_infnan(np.array([1.0, np.nan]))
    assert detect_infnan(np.array([np.inf]))
    set_seed(7)
    a = np.random.rand(3)
    set_seed(7)
    np.testing.assert_array_equal(a, np.random.rand(3))


def test_time_fn_syncs():
    f = jax.jit(lambda x: x * 2)
    out = time_fn(f, jnp.ones((8, 8)), iters=3)
    assert out["mean_s"] > 0 and out["iters"] == 3


def test_progress_line_tty_and_plain(capsys, monkeypatch):
    import io
    import sys

    from fnssl_tpu.utils.logging import ProgressLine

    # non-TTY: silent
    p = ProgressLine(0, total=4)
    p.update(0.5), p.close()
    assert capsys.readouterr().err == ""

    # TTY: writes in-place updates then a newline
    class FakeTTY(io.StringIO):
        def isatty(self):
            return True

    fake = FakeTTY()
    monkeypatch.setattr(sys, "stderr", fake)
    p = ProgressLine(3, total=2)
    p.update(0.25)
    p.update(0.125)
    p.close()
    out = fake.getvalue()
    assert out.count("\r") == 2 and out.endswith("\n")
    assert "epoch 3 [2/2]" in out and "0.12500" in out
