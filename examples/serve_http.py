"""Minimal prediction service over an exported serving artifact.

Demonstrates the deployment story end to end with nothing but the
standard library + JAX: load a `.jaxexport` artifact produced by
`pivp_tpu.inference.export_cli` (no model code needed) and serve batched
video predictions over HTTP.

Protocol:
  POST /predict   body = npz with arrays `images` (ctx, B, H, W, C)
                  float32 in [0,1], `actions` (T-1, B, A), `state0`
                  (B, S); response = npz with `frames`
                  (T-ctx, B, H, W, C) uint8.
  GET  /healthz   200 "ok" once the artifact is loaded and warmed up.

Run:  python examples/serve_http.py ARTIFACT.jaxexport [--port 8000]

The reference has no serving path at all — its closest analogue is
re-running predict_model.py per request, reloading the checkpoint and
rebuilding the Chainer graph each time.
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

logger = logging.getLogger("pivp-serve")


def make_server(artifact_path: str, host: str = "127.0.0.1",
                port: int = 8000) -> ThreadingHTTPServer:
    from pivp_tpu.inference import export as export_lib

    serve = export_lib.load_serving_artifact(artifact_path)
    in_specs = serve.exported.in_avals
    # Warm up (compiles the artifact for the local backend) so the first
    # request is fast.
    warm = tuple(np.zeros(s.shape, s.dtype) for s in in_specs)
    np.asarray(serve(*warm))
    logger.info("Loaded %s: inputs %s", artifact_path,
                [tuple(s.shape) for s in in_specs])

    lock = threading.Lock()  # one device dispatch at a time

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.debug(fmt, *args)

        def _reply(self, code: int, body: bytes,
                   ctype: str = "application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, b"ok", "text/plain")
            else:
                self._reply(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, b"not found", "text/plain")
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                with np.load(io.BytesIO(self.rfile.read(length))) as z:
                    args = (np.asarray(z["images"], np.float32),
                            np.asarray(z["actions"], np.float32),
                            np.asarray(z["state0"], np.float32))
            except Exception as e:  # undecodable payload -> client error
                self._reply(400, json.dumps(
                    {"error": f"{type(e).__name__}: {e}"}).encode(),
                    "application/json")
                return
            try:
                with lock:
                    frames = np.asarray(serve(*args))
                out = io.BytesIO()
                np.savez_compressed(out, frames=frames)
                self._reply(200, out.getvalue())
            except (TypeError, ValueError) as e:
                # Shape/dtype mismatch vs the artifact signature — the
                # client sent well-formed npz with the wrong tensors.
                self._reply(400, json.dumps(
                    {"error": f"{type(e).__name__}: {e}"}).encode(),
                    "application/json")
            except Exception as e:  # device OOM, backend mismatch, ...
                logger.exception("predict failed")
                self._reply(500, json.dumps(
                    {"error": f"{type(e).__name__}: {e}"}).encode(),
                    "application/json")

    return ThreadingHTTPServer((host, port), Handler)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    a = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    httpd = make_server(a.artifact, a.host, a.port)
    logger.info("Serving on http://%s:%d", *httpd.server_address)
    httpd.serve_forever()


if __name__ == "__main__":
    main()
