"""Minimal production inference server over an exported artifact.

Serves a StableHLO artifact (see ``export.py``) over HTTP with stdlib-only
dependencies — no model Python code is imported at serving time.

Endpoints:
  GET  /healthz   -> JSON: artifact i/o contract + platforms + stats
  POST /predict   -> body: a serialized ``.npy`` batch (np.save bytes);
                     response: the prediction batch as ``.npy`` bytes.

TPU-shape discipline: the artifact's batch axis is symbolic, but each
CONCRETE batch size still compiles its own XLA executable on first use.
``bucket_batches=True`` (default) pads every request batch up to the next
power of two and slices the padded rows off the reply — a handful of
executables serve every request size, and no request ever pays a compile
after warm-up. Predictions are per-sample (no cross-batch reduction), so
padding cannot perturb the real rows.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .export import load_exported


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class ModelServer:
    """Owns the deserialized artifact and a lock-serialized predict path.

    One process drives one chip; concurrent HTTP handlers funnel through
    a lock so device execution stays ordered (XLA programs are not
    re-entrant per stream anyway — the lock just makes latency fair).
    """

    def __init__(self, artifact_path: str, *, bucket_batches: bool = True):
        import jax

        self._exported = load_exported(artifact_path)
        self._call = jax.jit(self._exported.call)
        self._bucket = bucket_batches
        self._lock = threading.Lock()
        self._requests = 0
        self.artifact_path = artifact_path

    def contract(self) -> dict:
        return {
            "artifact": self.artifact_path,
            "platforms": list(self._exported.platforms),
            "inputs": [str(a) for a in self._exported.in_avals],
            "outputs": [str(a) for a in self._exported.out_avals],
            "bucket_batches": self._bucket,
            "requests_served": self._requests,
        }

    def predict(self, x: np.ndarray) -> np.ndarray:
        n = x.shape[0]
        if self._bucket:
            padded = _next_pow2(max(n, 1))
            if padded != n:
                pad = np.zeros((padded - n, *x.shape[1:]), x.dtype)
                x = np.concatenate([x, pad])
        with self._lock:
            y = np.asarray(self._call(x))
            self._requests += 1
        return y[:n]


class _Handler(BaseHTTPRequestHandler):
    server_version = "egt-serve/1"
    model: ModelServer  # set by make_server

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _reply(self, code: int, body: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            body = json.dumps(self.model.contract()).encode()
            self._reply(200, body, "application/json")
        else:
            self._reply(404, b"not found", "text/plain")

    def do_POST(self):
        if self.path != "/predict":
            self._reply(404, b"not found", "text/plain")
            return
        length = int(self.headers.get("Content-Length", 0))
        raw = self.rfile.read(length)
        try:
            x = np.load(io.BytesIO(raw), allow_pickle=False)
            y = self.model.predict(np.ascontiguousarray(x))
            buf = io.BytesIO()
            np.save(buf, y)
            self._reply(200, buf.getvalue(), "application/octet-stream")
        except Exception as e:  # malformed input must not kill the server
            body = json.dumps({"error": str(e)}).encode()
            self._reply(400, body, "application/json")


def make_server(
    artifact_path: str,
    *,
    host: str = "127.0.0.1",
    port: int = 0,
    bucket_batches: bool = True,
) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server; ``port=0`` picks a free
    port (read it back from ``server.server_address``)."""
    model = ModelServer(artifact_path, bucket_batches=bucket_batches)
    handler = type("Handler", (_Handler,), {"model": model})
    return ThreadingHTTPServer((host, port), handler)


def serve_forever(artifact_path: str, *, host="127.0.0.1", port=8000,
                  bucket_batches=True):
    server = make_server(
        artifact_path, host=host, port=port, bucket_batches=bucket_batches
    )
    print(f"[serve] {artifact_path} on http://{host}:{server.server_address[1]}")
    print(json.dumps(server.RequestHandlerClass.model.contract(), indent=2))
    server.serve_forever()
