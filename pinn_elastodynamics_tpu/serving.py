"""Field-evaluation serving.

The reference has no serving story — results are batch-rendered to PNGs.
For deployment, a trained model is a queryable field: given (x, y[, z], t)
points, return displacements/stresses/strains.  This module provides:

* :class:`FieldEvaluator` — a warm, chunk-compiled evaluator around a trained
  model (one executable reused for any request size);
* :class:`FieldServer` — a small stdlib HTTP server exposing it as JSON
  (``POST /predict`` {"points": [[x, y, t], ...], "fields": [...]}), with
  ``GET /healthz`` and ``GET /meta``.

stdlib-only (http.server) so the serving path has zero extra dependencies.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Sequence

import numpy as np

from .eval.render import predict_fields


class FieldEvaluator:
    """Warm evaluator: compiles once per chunk shape, serves any batch."""

    def __init__(self, model, params, *, chunk: int = 8192,
                 dtype=np.float32, name: str = "model"):
        self.model = model
        self.params = params
        self.chunk = chunk
        self.dtype = dtype
        self.name = name
        self._lock = threading.Lock()

    def warmup(self):
        ndim = self.model.spec.ndim
        self.evaluate(np.zeros((1, ndim)), 0.0)
        return self

    def evaluate(
        self, xy: np.ndarray, t: float,
        fields: Optional[Sequence[str]] = None,
    ) -> Dict[str, np.ndarray]:
        xy = np.asarray(xy, self.dtype)
        if xy.ndim != 2 or xy.shape[1] != self.model.spec.ndim:
            raise ValueError(
                f"points must be (N, {self.model.spec.ndim}), got {xy.shape}"
            )
        with self._lock:  # single-device execution; serialize requests
            out = predict_fields(
                self.model, self.params, xy, float(t),
                chunk=self.chunk, dtype=self.dtype,
            )
        if fields:
            unknown = set(fields) - set(out)
            if unknown:
                raise KeyError(f"unknown fields: {sorted(unknown)}")
            out = {k: out[k] for k in fields}
        return out

    @property
    def meta(self) -> dict:
        return {
            "name": self.name,
            "ndim": self.model.spec.ndim,
            "formulation": self.model.spec.formulation,
            "channels": list(self.model.spec.channels),
            "chunk": self.chunk,
        }


def _make_handler(evaluator: FieldEvaluator):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok"})
            elif self.path == "/meta":
                self._send(200, evaluator.meta)
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                pts = np.asarray(req["points"], dtype=np.float64)
                t = float(req.get("t", 0.0))
                fields = req.get("fields")
                out = evaluator.evaluate(pts, t, fields)
                self._send(200, {
                    "n": int(pts.shape[0]),
                    "t": t,
                    "fields": {k: v.tolist() for k, v in out.items()},
                })
            except (KeyError, ValueError, TypeError) as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover - defensive
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


class FieldServer:
    """Threaded HTTP server around a FieldEvaluator."""

    def __init__(self, evaluator: FieldEvaluator, host="127.0.0.1", port=0):
        self._httpd = ThreadingHTTPServer(
            (host, port), _make_handler(evaluator)
        )
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self):
        return self._httpd.server_address

    def start(self):
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
