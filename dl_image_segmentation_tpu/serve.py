"""Micro-batching inference server: the production-serving layer.

The reference stops at notebook-driven batch prediction; a deployed
segmentation model needs an online endpoint. This is a stdlib-only
HTTP server around ``Trainer.predict_probs`` designed TPU-first:

- requests arriving within a short window (``--max-wait-ms``) are
  packed into ONE fixed-size batch (padded to the compiled batch
  size), so the device sees a single jit shape no matter the request
  arrival pattern -- no recompiles, full data-axis sharding over the
  mesh, and the MXU always runs at the tuned batch shape;
- one forward pass serves BOTH output kinds: probability requests get
  the softmax map, class-map requests its argmax (bit-identical to
  ``Trainer.predict``);
- decode and scaling reuse the offline rules (`dlseg-tpu predict`):
  PNG/JPG/GeoTIFF bytes through this framework's own codecs, ``.npy``
  bodies taken as raw (already-scaled) float arrays;
- bounded admission: beyond ``max_queue`` waiting requests the server
  answers 503 immediately (fail fast beats unbounded latency), and
  shutdown fails queued requests instead of letting them time out.

Endpoints:
  GET  /healthz            -> JSON status (model, step, batch size)
  POST /predict            -> uint8 class map as .npy bytes
  POST /predict?probs=1    -> float32 (H, W, num_classes) .npy bytes

Request body: an encoded PNG/JPG/GeoTIFF chip, or a .npy float array
(H, W, C). Responses are .npy (application/x-npy); errors are JSON
with appropriate 4xx/5xx statuses.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

__all__ = ["PredictServer", "make_http_server", "scale_image"]


def scale_image(src: np.ndarray, scale: str) -> np.ndarray:
    """The offline predict CLI's deterministic scaling rules: 'auto'
    scales by SOURCE dtype (uint8 -> /255, uint16 -> /65535, floats
    untouched), 'none' feeds raw DNs (tifraw/tifarr-trained
    checkpoints), any other value is a float multiplier."""
    imgs = src.astype(np.float32)
    if scale == "auto":
        if src.dtype == np.uint8:
            imgs /= 255.0
        elif src.dtype == np.uint16:
            imgs /= 65535.0
    elif scale != "none":
        imgs *= float(scale)
    return imgs


class _Pending:
    __slots__ = ("img", "probs", "event", "result", "error", "status")

    def __init__(self, img: np.ndarray, probs: bool):
        self.img = img
        self.probs = probs
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[str] = None
        self.status: int = 500  # HTTP status when error is set


class PredictServer:
    """Collects requests into fixed-size device batches.

    One background worker drains the queue: the first request opens a
    batch window of ``max_wait_ms``; whatever arrived by then (capped
    at the compiled batch size) rides one ``predict_probs`` dispatch.
    Under load the window never idles -- a full batch closes
    immediately -- so max_wait_ms bounds LATENCY, not throughput."""

    def __init__(self, trainer, max_wait_ms: float = 5.0,
                 max_queue: int = 0):
        self.trainer = trainer
        self.batch_size = int(trainer.config.batch_size)
        self.max_wait = max_wait_ms / 1e3
        # backpressure: beyond max_queue waiting requests, submit fails
        # fast with 503 instead of stacking unbounded latency (default:
        # 8 batches' worth in flight)
        self.max_queue = max_queue or 8 * self.batch_size
        self.q: "queue.Queue[_Pending]" = queue.Queue(self.max_queue)
        self.served = 0
        self.batches = 0
        self.rejected = 0
        self._stop = False
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def submit(self, img: np.ndarray, probs: bool,
               timeout: float = 60.0) -> _Pending:
        """img: float32 (H, W, C), already scaled. Blocks until the
        batch containing this request completes. A full queue or a
        shutting-down server fails fast (503), never blocks."""
        p = _Pending(img, probs)
        if self._stop:
            p.error, p.status = "server shutting down", 503
            return p
        try:
            self.q.put_nowait(p)
        except queue.Full:
            self.rejected += 1
            p.error, p.status = (
                f"server overloaded ({self.max_queue} requests queued)",
                503)
            return p
        if not p.event.wait(timeout):
            p.error = "inference timed out"
        return p

    def close(self):
        self._stop = True
        self._worker.join(timeout=5.0)
        # fail anything still queued so callers don't sit out their
        # full timeout against a dead worker
        while True:
            try:
                p = self.q.get_nowait()
            except queue.Empty:
                break
            p.error, p.status = "server shutting down", 503
            p.event.set()

    def _loop(self):
        while not self._stop:
            try:
                first = self.q.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.max_wait
            while len(batch) < self.batch_size:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    batch.append(self.q.get(timeout=left))
                except queue.Empty:
                    break
            self._run(batch)

    def _run(self, batch):
        try:
            imgs = np.stack([p.img for p in batch])
            if len(batch) < self.batch_size:
                # pad to the compiled batch size: one jit shape forever
                pad = np.zeros((self.batch_size - len(batch),)
                               + imgs.shape[1:], imgs.dtype)
                imgs = np.concatenate([imgs, pad])
            # one forward serves both kinds: class maps are the
            # probability map's argmax (identical to Trainer.predict)
            probs = self.trainer.predict_probs(imgs)
            for i, p in enumerate(batch):
                p.result = (probs[i].astype(np.float32) if p.probs
                            else probs[i].argmax(axis=-1)
                            .astype(np.uint8))
            self.served += len(batch)
            self.batches += 1
        except Exception as e:  # noqa: BLE001 -- surface to every caller
            for p in batch:
                p.error = f"{type(e).__name__}: {e}"
        finally:
            for p in batch:
                p.event.set()


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def make_http_server(host: str, port: int, server: PredictServer,
                     scale: str = "auto") -> ThreadingHTTPServer:
    """Bind a ThreadingHTTPServer serving /healthz and /predict on top
    of a PredictServer. Caller runs .serve_forever() (and .shutdown()
    to stop). Port 0 binds an ephemeral port (see .server_address)."""
    trainer = server.trainer
    cfg = trainer.config
    expect = (cfg.image_size, cfg.image_size, cfg.in_channels)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.split("?")[0] != "/healthz":
                return self._json(404, {"error": "not found"})
            self._json(200, {
                "ok": True, "model": cfg.model,
                "step": int(trainer.state.step),
                "image_size": cfg.image_size,
                "in_channels": cfg.in_channels,
                "num_classes": cfg.num_classes,
                "batch_size": server.batch_size,
                "served": server.served, "batches": server.batches,
                "rejected": server.rejected,
                "max_queue": server.max_queue})

        def do_POST(self):
            path, _, query = self.path.partition("?")
            if path != "/predict":
                return self._json(404, {"error": "not found"})
            want_probs = "probs=1" in query
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                arr = self._decode(body)
            except Exception as e:  # noqa: BLE001 -- client error
                return self._json(400, {"error": f"bad request body: "
                                                 f"{e}"})
            if arr.ndim == 2:
                arr = arr[:, :, None]
            if arr.shape != expect:
                return self._json(400, {
                    "error": f"expected {expect} chip, got "
                             f"{tuple(arr.shape)}"})
            p = server.submit(arr, want_probs)
            if p.error is not None:
                return self._json(p.status, {"error": p.error})
            out = _npy_bytes(p.result)
            self.send_response(200)
            self.send_header("Content-Type", "application/x-npy")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        @staticmethod
        def _decode(body: bytes) -> np.ndarray:
            if body[:6] == b"\x93NUMPY":
                # raw array: caller already applied its own scaling
                return np.asarray(np.load(io.BytesIO(body),
                                          allow_pickle=False),
                                  np.float32)
            from .raster.image import decode_image_bytes
            g = decode_image_bytes(body)
            return scale_image(np.asarray(g.array), scale)

    return ThreadingHTTPServer((host, port), Handler)
