"""Streaming localization server (runtime/server.py): wire-protocol
round trip, per-connection state independence, and CLI wiring."""
import json
import os

import jax
import numpy as np
import pytest

from fnssl_tpu.eval import PredDOA
from fnssl_tpu.models.fnssl import FNSSLConfig, init_fnssl_params
from fnssl_tpu.runtime.server import LocalizationServer, stream_client
from fnssl_tpu.runtime.streaming import (StreamingLocalizer,
                                         make_fnssl_stream_step)


@pytest.fixture(scope="module")
def fnssl_setup():
    cfg = FNSSLConfig()
    params = init_fnssl_params(jax.random.PRNGKey(0), cfg)
    decoder = PredDOA()

    def decode(chunk):
        return decoder.predgt2doa(np.asarray(chunk, np.float32))[0]

    def factory():
        loc = StreamingLocalizer(make_fnssl_stream_step(params, cfg),
                                 nch=2, ch_mode="MM")
        return loc, decode

    return params, cfg, factory, decode


def test_server_roundtrip_matches_direct(fnssl_setup):
    params, cfg, factory, decode = fnssl_setup
    sig = np.random.default_rng(0).standard_normal(
        (16000, 2)).astype(np.float32) * 0.1

    server = LocalizationServer(factory).start()
    try:
        msgs = stream_client("127.0.0.1", server.port, sig, block=1600)
    finally:
        server.shutdown()
    assert msgs[-1] == {"eof": True, "outputs": len(msgs) - 1}
    assert len(msgs) > 1

    # direct pipeline over the same pushes
    loc, _ = factory()
    want = []
    for start in range(0, sig.shape[0], 1600):
        for out in loc.push(sig[start: start + 1600]):
            res = decode(out)
            doa = np.degrees(np.asarray(res["doa"]))[0]
            want.extend(doa[k] for k in range(doa.shape[0]))
    assert len(want) == len(msgs) - 1
    for msg, w in zip(msgs[:-1], want):
        np.testing.assert_allclose(msg["doa_deg"], np.round(w, 3),
                                   atol=1e-3)


def test_server_connections_are_independent(fnssl_setup):
    """Two sequential connections over the same audio produce identical
    outputs — state resets per connection, nothing leaks across."""
    _, _, factory, _ = fnssl_setup
    sig = np.random.default_rng(1).standard_normal(
        (8000, 2)).astype(np.float32) * 0.1
    server = LocalizationServer(factory).start()
    try:
        a = stream_client("127.0.0.1", server.port, sig)
        b = stream_client("127.0.0.1", server.port, sig)
    finally:
        server.shutdown()
    assert a == b and a[-1]["eof"]


def test_server_rejects_wrong_channel_count(fnssl_setup):
    _, _, factory, _ = fnssl_setup
    sig = np.zeros((4000, 3), np.float32)          # model expects 2
    server = LocalizationServer(factory).start()
    try:
        msgs = stream_client("127.0.0.1", server.port, sig)
    finally:
        server.shutdown()
    assert "error" in msgs[-1] and "nch" in msgs[-1]["error"]


def test_rejected_client_mid_send_gets_error_json(fnssl_setup):
    """The duplex race the r3 review caught: a client still pumping
    blocks when the server rejects its header must receive the error
    JSON, not die in sendall. The signal is far larger than both TCP
    buffers, so the client is GUARANTEED mid-send when the rejection
    lands; repeated to make the old 1-in-200 flake a sure failure."""
    _, _, factory, _ = fnssl_setup
    sig = np.zeros((1_200_000, 3), np.float32)     # ~14 MB of blocks
    server = LocalizationServer(factory).start()
    try:
        for _ in range(3):
            msgs = stream_client("127.0.0.1", server.port, sig,
                                 block=160_000)
            assert len(msgs) == 1, msgs
            assert "error" in msgs[0] and "nch" in msgs[0]["error"]
    finally:
        server.shutdown()


def test_non_reading_batch_client(fnssl_setup):
    """A client that pushes the whole recording before reading anything
    (the batch pattern the docstring warns about) still gets every
    output while responses fit the socket buffer — and an interleaved
    live client (read_every) gets the identical stream."""
    _, _, factory, _ = fnssl_setup
    sig = np.random.default_rng(3).standard_normal(
        (160_000, 2)).astype(np.float32) * 0.1     # 10 s of audio
    server = LocalizationServer(factory).start()
    try:
        batch = stream_client("127.0.0.1", server.port, sig, block=8000)
        live = stream_client("127.0.0.1", server.port, sig, block=8000,
                             read_every=2)
    finally:
        server.shutdown()
    assert batch[-1]["eof"] and batch[-1]["outputs"] == len(batch) - 1
    assert len(batch) > 20
    assert live == batch


def test_server_reaps_finished_connection_threads(fnssl_setup):
    """_threads must not grow with total connections served
    (runtime/server.py accept-loop reaping)."""
    import time

    _, _, factory, _ = fnssl_setup
    sig = np.random.default_rng(4).standard_normal(
        (8000, 2)).astype(np.float32) * 0.1
    server = LocalizationServer(factory).start()
    try:
        for _ in range(8):
            stream_client("127.0.0.1", server.port, sig)
        time.sleep(1.2)     # let handlers exit + one accept-loop tick
        stream_client("127.0.0.1", server.port, sig)
        assert len(server._threads) <= 2
    finally:
        server.shutdown()


def test_cli_serve_wiring(tmp_path, monkeypatch, capsys):
    """cli serve builds a working per-connection session factory and
    announces its port (serve_forever stubbed — socket loop covered by
    the protocol tests above)."""
    from fnssl_tpu.cli.main import main
    from fnssl_tpu.runtime import server as server_mod

    captured = {}
    real_init = server_mod.LocalizationServer.__init__

    def spy_init(self, session_factory, **kw):
        captured["factory"] = session_factory
        real_init(self, session_factory, **kw)

    monkeypatch.setattr(server_mod.LocalizationServer, "__init__",
                        spy_init)
    monkeypatch.setattr(server_mod.LocalizationServer, "serve_forever",
                        lambda self: None)
    monkeypatch.chdir(tmp_path)
    main(["serve", "--model", "fnssl", "--log-dir", "runs/none",
          "--port", "0"])
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["serving"] == "fnssl" and info["port"] > 0
    loc, decode = captured["factory"]()
    outs = loc.push(np.zeros((4000, 2), np.float32))
    assert outs and np.isfinite(
        np.asarray(decode(outs[0])["doa"])).all()


def test_cli_serve_slot_batched(tmp_path, monkeypatch, capsys):
    """cli serve --slots N: sessions lease slots in ONE batched device
    program; outputs equal the unbatched path and slots free on
    close()."""
    from fnssl_tpu.cli.main import main
    from fnssl_tpu.runtime import server as server_mod
    from fnssl_tpu.runtime.slots import _SlotSession

    captured = {}
    real_init = server_mod.LocalizationServer.__init__

    def spy_init(self, session_factory, **kw):
        captured["factory"] = session_factory
        real_init(self, session_factory, **kw)

    monkeypatch.setattr(server_mod.LocalizationServer, "__init__",
                        spy_init)
    monkeypatch.setattr(server_mod.LocalizationServer, "serve_forever",
                        lambda self: None)
    monkeypatch.chdir(tmp_path)
    sig = np.random.default_rng(5).standard_normal(
        (8000, 2)).astype(np.float32) * 0.1

    main(["serve", "--model", "fnssl", "--log-dir", "runs/none",
          "--port", "0", "--slots", "2"])
    capsys.readouterr()
    loc, decode = captured["factory"]()
    assert isinstance(loc.model_step, _SlotSession)
    outs = [np.asarray(o) for o in loc.push(sig)]
    loc.model_step.close()

    main(["serve", "--model", "fnssl", "--log-dir", "runs/none",
          "--port", "0"])                          # unbatched reference
    capsys.readouterr()
    loc2, decode2 = captured["factory"]()
    want = [np.asarray(o) for o in loc2.push(sig)]
    assert len(outs) == len(want) >= 1
    for g, w in zip(outs, want):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)


def test_host_compute_frontend_matches_default(fnssl_setup):
    """host_compute=True (serving default: front-end STFT/norm + DOA
    decode pinned to the local CPU jax device so a remote accelerator
    sees exactly one call per chunk) is the same math — outputs match
    the default-device path over identical pushes, and the model step
    receives plain host arrays."""
    from fnssl_tpu.cli.main import _stream_session_factory
    from fnssl_tpu.train.tasks import make_fnssl_task

    params, cfg, _, _ = fnssl_setup
    task = make_fnssl_task()
    sig = np.random.default_rng(7).standard_normal(
        (16000, 2)).astype(np.float32) * 0.1

    def run(host_compute):
        seen_types = []

        def spy_step():
            step = make_fnssl_stream_step(params, cfg)

            def wrapped(feats):
                seen_types.append(type(feats))
                return step(feats)
            return wrapped

        make_loc, decode = _stream_session_factory(
            "fnssl", task, params, None, 2, 12,
            host_compute=host_compute)
        loc = make_loc()
        loc.model_step = spy_step()
        out = []
        for start in range(0, sig.shape[0], 1600):
            for chunk in loc.push(sig[start: start + 1600]):
                res = decode(chunk)
                out.append((np.asarray(res["doa"]),
                            np.asarray(res["vad_sources"])))
        return out, seen_types

    got, types_host = run(True)
    want, _ = run(False)
    assert len(got) == len(want) >= 3
    assert all(t is np.ndarray for t in types_host)
    for (gd, gv), (wd, wv) in zip(got, want):
        np.testing.assert_allclose(gd, wd, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(gv, wv, rtol=1e-5, atol=1e-5)
