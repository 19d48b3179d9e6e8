"""Minimal HTTP inference server over the micro-batching engine.

Standard-library only (ThreadingHTTPServer): concurrent requests land in the
InferenceEngine's queue and coalesce into bucketed device batches — the HTTP
layer is deliberately thin so the serving numbers are the engine's.

Endpoints:
- ``POST /predict``: body = JPEG/PNG bytes (or raw ``.npy`` uint8 HWC array).
  The image is decoded + bilinear-resized host-side to the model's
  ``img_size`` and queued. Response JSON: ``{"pred": int, "logits": [...]}``;
  add ``?maps=1`` for the rendered per-class slot maps (base64 PNG each).
- ``GET /healthz``: engine stats (requests, batches, padding).

CLI: ``python -m scouter_tpu.serve.server --port 8000 <model flags ...>`` —
rebuilds the model from the config-derived checkpoint like the export CLI.
"""

from __future__ import annotations

import base64
import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np

__all__ = ["make_server", "main"]


def _decode_image(body: bytes, img_size: int, channels: int) -> np.ndarray:
    if body[:6] == b"\x93NUMPY":  # .npy magic
        arr = np.load(io.BytesIO(body), allow_pickle=False)
        if arr.dtype != np.uint8:
            raise ValueError(f"npy payload must be uint8, got {arr.dtype}")
    else:
        from PIL import Image

        im = Image.open(io.BytesIO(body))
        im = im.convert("L" if channels == 1 else "RGB")
        im = im.resize((img_size, img_size), Image.BILINEAR)
        arr = np.asarray(im, np.uint8)
        if channels == 1:
            arr = arr[..., None]
    if arr.shape != (img_size, img_size, channels):
        raise ValueError(f"expected ({img_size},{img_size},{channels}), got {arr.shape}")
    return arr


def _png_gray(arr: np.ndarray, level: int = 1) -> bytes:
    """Minimal grayscale PNG encoder: filter-0 scanlines + one zlib IDAT.

    7x faster than PIL on realistic smooth slot maps (0.6 vs 4.2 ms at
    224px, 2.3x worst-case on noise) — the maps-response encode was the
    last measurable serving stage after the r5 resolver fix
    (docs/SERVE_LOAD_r5.md caveat). Output is a spec-valid 8-bit
    grayscale PNG (PIL round-trip pixel-equality tested)."""
    import struct
    import zlib

    h, w = arr.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data +
                struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = np.empty((h, w + 1), np.uint8)
    raw[:, 0] = 0  # per-scanline filter byte: None
    raw[:, 1:] = arr
    idat = zlib.compress(raw.tobytes(), level)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def _png_b64(map_u8: np.ndarray) -> str:
    return base64.b64encode(_png_gray(np.asarray(map_u8, np.uint8))).decode("ascii")


def make_server(engine, img_size: int, channels: int,
                address: Tuple[str, int] = ("127.0.0.1", 8000)) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server bound to ``address``; port 0 picks a
    free port (``server.server_address`` reports the real one).

    The returned server carries ``http_samples()`` — per-request HTTP-stage
    timings (read/decode/engine_wait/encode, plus write patched in after the
    response goes out) feeding the load bench's budget table
    (docs/SERVE_LOAD_r5.md). Samples are appended BEFORE the response bytes
    are written, so a client that joins on its response and then snapshots
    the samples sees every request it completed."""
    import collections
    import threading

    samples: "collections.deque" = collections.deque(maxlen=8192)
    samples_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            blob = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                self._send(200, {"status": "ok", "stats": engine.stats()})
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if not self.path.startswith("/predict"):
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                import time

                t0 = time.monotonic()
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                t_read = time.monotonic()
                image = _decode_image(body, img_size, channels)
                t_dec = time.monotonic()
                out = engine.submit(image).result(timeout=60)
                t_wait = time.monotonic()
                logits = np.asarray(out["logits"], np.float32)
                payload = {"pred": int(logits.argmax()),
                           "logits": [float(v) for v in logits]}
                want_maps = "maps=1" in self.path and "slot_maps" in out
                if want_maps:
                    payload["slot_maps_png"] = [
                        _png_b64(m) for m in np.asarray(out["slot_maps"])]
                t_enc = time.monotonic()
                sample = {"read": t_read - t0, "decode": t_dec - t_read,
                          "engine_wait": t_wait - t_dec,
                          "encode": t_enc - t_wait, "maps": want_maps}
                with samples_lock:
                    samples.append(sample)
                self._send(200, payload)
                # patch write-time into the already-recorded sample: readers
                # racing this mutation at worst miss the 'write' key (the
                # budget table skips absent keys), never the sample
                sample["write"] = time.monotonic() - t_enc
            except Exception as exc:  # per-request isolation
                self._send(400, {"error": f"{type(exc).__name__}: {exc}"})

        def log_message(self, *args):  # quiet access log
            pass

    server = ThreadingHTTPServer(address, Handler)

    def http_samples():
        with samples_lock:
            return list(samples)

    server.http_samples = http_samples
    return server


def main(argv=None):
    import argparse

    from ..core.cache import setup_compilation_cache
    from ..core.config import config_from_args, get_args_parser
    from ..train.state import restore_inference_state
    from .engine import InferenceEngine

    setup_compilation_cache()
    parser = argparse.ArgumentParser(
        "SCOUTER-TPU inference server", parents=[get_args_parser()])
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--buckets", default="1,4,16")
    parser.add_argument("--max_wait_ms", type=float, default=2.0)
    parser.add_argument("--max_inflight", type=int, default=8,
                        help="device batches in flight before the "
                             "dispatcher blocks (pipelining depth)")
    parser.add_argument("--resolvers", type=int, default=4,
                        help="concurrent device->host fetch threads "
                             "(overlaps transfer RTTs; docs/SERVE_LOAD_r5.md)")
    ns = parser.parse_args(argv)
    cfg = config_from_args(ns).replace(use_pre=False)

    _, state, restored = restore_inference_state(cfg)
    print(f"restored {restored}" if restored else "serving fresh-init weights")
    channels = 1 if cfg.dataset == "MNIST" else 3
    buckets = [int(b) for b in ns.buckets.split(",")]
    engine = InferenceEngine(cfg, state.variables(), buckets=buckets,
                             max_wait_ms=ns.max_wait_ms,
                             max_inflight=ns.max_inflight,
                             resolvers=ns.resolvers)
    # compile every bucket BEFORE accepting traffic: a cold jit compile can
    # take minutes and would otherwise burn the first requests' timeouts
    for b in sorted(buckets):
        engine.infer_batch(
            np.zeros((b, cfg.img_size, cfg.img_size, channels), np.uint8))
        print(f"warmed bucket {b}")
    server = make_server(engine, cfg.img_size, channels, (ns.host, ns.port))
    host, port = server.server_address[:2]
    print(f"serving on http://{host}:{port} (POST /predict, GET /healthz)")
    try:
        server.serve_forever()
    finally:
        engine.close()


if __name__ == "__main__":
    main()
