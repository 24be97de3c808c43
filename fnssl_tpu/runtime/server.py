"""Line-protocol streaming localization server.

The deployment endpoint the reference ecosystem leaves to the user:
`cli serve` turns a checkpoint or an exported artifact into a TCP
service that accepts raw PCM and emits DOA/VAD per model output block.
One connection = one independent stream (own model state, own
forgetting-norm statistics); connections are handled concurrently, the
device naturally batches across them at dispatch level.

Wire protocol (newline-framed JSON control, length-framed binary audio):

  client → server   one JSON header line:
                      {"nch": 2}            # channels in the PCM
  client → server   repeated audio blocks:
                      4-byte big-endian uint32 N, then N bytes of
                      float32 little-endian PCM, interleaved
                      (nsample × nch) — any block size
  server → client   one JSON line per fired model output:
                      {"t": <output index>, "doa_deg": [...],
                       "vad": [...]}
  client → server   zero-length block (N=0) = end of stream; the server
                    replies {"eof": true, "outputs": <count>} and closes.

Everything is plain sockets — no framework dependency — so a client is
~15 lines in any language.

Flow-control note: the server alternates read-block → send-outputs, so
a client that pumps a very long recording without ever reading responses
can fill both TCP buffers and stall the pair. Live clients read as they
send (audio arrives in real time); batch clients should either read
concurrently or keep pushes under the OS socket-buffer budget (the
bundled stream_client sends ≤ a few hundred KB per session, far below
it).
"""
from __future__ import annotations

import json
import socket
import struct
import threading
from typing import Callable

import numpy as np


def _read_exact(f, n: int) -> bytes | None:
    """Exact read from the connection's buffered reader. ALL reads must
    go through the same makefile object — the header readline() buffers
    ahead, so mixing in raw socket.recv() would skip buffered bytes and
    desynchronize the protocol."""
    buf = f.read(n)
    return buf if buf is not None and len(buf) == n else None


class LocalizationServer:
    """TCP server: per-connection StreamingLocalizer + DOA decode.

    Args:
      session_factory: () -> (localizer, decode) where ``localizer`` is
        a fresh StreamingLocalizer and ``decode(chunk) -> dict`` maps a
        model output block to {'doa' (1, k, 2[, ns]) radians,
        'vad_sources' (1, k[, ns])}.
      host/port: bind address; port=0 picks a free port (see .port).
    """

    def __init__(self, session_factory: Callable, host: str = "127.0.0.1",
                 port: int = 0):
        self.session_factory = session_factory
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(16)
        self.port = self._sock.getsockname()[1]
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []

    def serve_forever(self):
        """Accept loop (blocking). Call .shutdown() from another thread
        (or a signal handler) to stop."""
        self._sock.settimeout(0.5)
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            t = threading.Thread(target=self._handle, args=(conn,),
                                 daemon=True)
            t.start()
            self._threads.append(t)
        self._sock.close()

    def start(self):
        """serve_forever on a daemon thread; returns self."""
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        self._accept_thread = t
        return self

    def shutdown(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5.0)
        if hasattr(self, "_accept_thread"):
            self._accept_thread.join(timeout=5.0)

    # ------------------------------------------------------- connection

    def _handle(self, conn: socket.socket):
        localizer = None
        try:
            f = conn.makefile("rb")
            header = json.loads(f.readline().decode())
            nch = int(header["nch"])
            localizer, decode = self.session_factory()
            if localizer.nch != nch:
                conn.sendall(json.dumps(
                    {"error": f"server model expects nch="
                              f"{localizer.nch}, got {nch}"}).encode()
                    + b"\n")
                return
            emitted = 0
            while True:
                head = _read_exact(f, 4)
                if head is None:
                    break                          # client vanished
                (n,) = struct.unpack(">I", head)
                if n == 0:                         # clean end of stream
                    conn.sendall(json.dumps(
                        {"eof": True, "outputs": emitted}).encode()
                        + b"\n")
                    break
                payload = _read_exact(f, n)
                if payload is None:
                    break
                pcm = np.frombuffer(payload, "<f4").reshape(-1, nch)
                for out in localizer.push(pcm):
                    res = decode(out)
                    doa = np.degrees(np.asarray(res["doa"]))[0]
                    vad = np.asarray(res["vad_sources"])[0]
                    for k in range(doa.shape[0]):
                        msg = {"t": emitted,
                               "doa_deg": np.round(doa[k], 3).tolist(),
                               "vad": np.round(vad[k], 4).tolist()}
                        conn.sendall(json.dumps(msg).encode() + b"\n")
                        emitted += 1
        except (ConnectionError, json.JSONDecodeError, KeyError,
                ValueError, RuntimeError) as e:
            try:
                conn.sendall(json.dumps(
                    {"error": f"{type(e).__name__}: {e}"}).encode()
                    + b"\n")
            except OSError:
                pass
        finally:
            # slot-pool sessions must release their slot on disconnect
            close = getattr(getattr(localizer, "model_step", None),
                            "close", None)
            if close is not None:
                close()
            conn.close()


def stream_client(host: str, port: int, sig: np.ndarray,
                  block: int = 1600):
    """Reference client: send (nsample, nch) float32 PCM in ``block``-
    sample pieces, return the server's decoded outputs. (Also the test
    harness — the protocol is trivial enough that this IS the spec.)"""
    out = []
    with socket.create_connection((host, port)) as conn:
        conn.sendall(json.dumps({"nch": int(sig.shape[1])}).encode()
                     + b"\n")
        f = conn.makefile("rb")
        conn.setblocking(True)
        for start in range(0, sig.shape[0], block):
            payload = np.ascontiguousarray(
                sig[start: start + block], "<f4").tobytes()
            conn.sendall(struct.pack(">I", len(payload)) + payload)
        conn.sendall(struct.pack(">I", 0))
        for line in f:
            msg = json.loads(line.decode())
            if "eof" in msg or "error" in msg:
                out.append(msg)
                break
            out.append(msg)
    return out
