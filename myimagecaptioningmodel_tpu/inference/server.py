"""Long-running caption server with dynamic batching.

The reference's serving story is one image per process invocation
(infer.py:26-36 — download, load the frozen program, run, exit). This is
the production-shaped resident service: the bundle is loaded and the decode
jitted ONCE at a fixed batch shape; concurrent requests are collected into
that shape (dispatch when full or after ``max_wait_ms``), decoded in one
device call, and answered individually. Amortizing the fixed per-dispatch
cost across requests is what turns the ~X ms single-image latency into the
device's batched captions/s rate.

Stdlib-only HTTP (no extra deps):

    python -m myimagecaptioningmodel_tpu.inference.server \
        [--config cfg.json] [--port 8765] [--batch 8] [--beam N] \
        [--quantize] [--max-wait-ms 5]

    POST /caption   body = raw image bytes (JPEG/PNG/...)
                    -> {"ids": [...], "caption": "..."}
    GET  /healthz   -> {"status": "ok", "batch": B, ...}

The batcher pads partial batches with zeros (same fixed executable; padded
rows are decoded and dropped, exactly like the evaluators' final batch).
"""

from __future__ import annotations

import io
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

from myimagecaptioningmodel_tpu.data import image as image_mod
from myimagecaptioningmodel_tpu.evaluation import metrics
from myimagecaptioningmodel_tpu.evaluation.evaluate import load_bundle


class _Request:
    __slots__ = ("arr", "event", "ids", "error")

    def __init__(self, arr):
        self.arr = arr  # [H, W, 3] float32 NHWC (normalized)
        self.event = threading.Event()
        self.ids: Optional[List[int]] = None
        self.error: Optional[str] = None


class CaptionService:
    """Bundle + jitted fixed-batch decode + dynamic batcher thread."""

    def __init__(self, cfg, bundle: str = "infer", batch_size: int = 8,
                 beam_size: int = 0, quantize: bool = False,
                 early_stop: bool = False, max_wait_ms: float = 5.0,
                 length_norm: float = 0.0) -> None:
        from myimagecaptioningmodel_tpu.data.reader import DataReader

        self.cfg = cfg
        self.batch_size = batch_size
        self.max_wait = max_wait_ms / 1000.0
        self.params, self.state, _bcfg, self.opts, self.decode = load_bundle(
            cfg, bundle, beam_size, quantize,
            early_stop=early_stop, length_norm=length_norm,
        )
        self.index_word = DataReader(cfg).index_word
        self.shape = tuple(cfg.data.image_shape)
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        # serving counters (read by /healthz): guarded by _stats_lock
        self._stats_lock = threading.Lock()
        self._served = 0
        self._dispatches = 0
        self._batch_fill = 0
        self._lat_ms: List[float] = []  # rolling decode latencies
        self._thread = threading.Thread(
            target=self._batcher, daemon=True, name="caption-batcher"
        )
        self._thread.start()
        self.warmup()

    # -- request path -------------------------------------------------------

    def prepare(self, data: bytes) -> np.ndarray:
        """image bytes -> normalized [H, W, 3] float32 (NHWC row).

        Raises ValueError for undecodable bytes (mapped to HTTP 400)."""
        from PIL import Image

        try:
            img = Image.open(io.BytesIO(data)).convert("RGB")
        except Exception as e:
            raise ValueError(f"cannot decode image: {e}") from e
        arr = image_mod.process_image(
            img, self.shape, self.cfg.data.image_mean, self.cfg.data.image_std
        )
        return image_mod.chw_to_nhwc(arr[None])[0]

    def caption_bytes(self, data: bytes, timeout: float = 60.0) -> dict:
        if self._stop.is_set():
            raise RuntimeError("server shutting down")
        req = _Request(self.prepare(data))
        self._q.put(req)
        if self._stop.is_set():
            # close() raced our enqueue: its drain may already have run, so
            # nothing would ever complete this request — re-drain so it (and
            # any other racer) fails fast instead of blocking out `timeout`
            self._drain_queue()
        if not req.event.wait(timeout):
            raise TimeoutError("decode queue timeout")
        if req.error:
            raise RuntimeError(req.error)
        words = metrics.filter_ids(
            req.ids, self.index_word, self.cfg.data.stop_idx,
            self.cfg.data.padding_idx,
        )
        return {"ids": req.ids, "caption": metrics.words2sentence(words)}

    def warmup(self) -> None:
        """Compile the fixed-shape decode before serving traffic."""
        import jax

        B = self.batch_size
        x = np.zeros((B, *self.shape, 3), np.float32)
        jax.block_until_ready(self.decode(self.params, self.state, x))

    def stats(self) -> dict:
        """Serving counters: totals, mean batch fill, decode latency p50/p90."""
        with self._stats_lock:
            lat = sorted(self._lat_ms)
            d = max(self._dispatches, 1)
            return {
                "served": self._served,
                "dispatches": self._dispatches,
                "mean_batch_fill": round(self._batch_fill / d, 2),
                "decode_ms_p50": round(lat[len(lat) // 2], 2) if lat else None,
                "decode_ms_p90": (
                    round(lat[int(len(lat) * 0.9)], 2) if lat else None
                ),
            }

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
        # fail-fast any requests still queued instead of letting their
        # callers block out the full wait timeout
        self._drain_queue()

    def _drain_queue(self) -> None:
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                break
            r.error = "server shutting down"
            r.event.set()

    # -- batcher ------------------------------------------------------------

    def _batcher(self) -> None:
        import time

        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.batch_size:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            try:
                t0 = time.monotonic()
                imgs = np.zeros(
                    (self.batch_size, *self.shape, 3), np.float32
                )
                for i, r in enumerate(batch):
                    imgs[i] = r.arr
                ids = np.asarray(self.decode(self.params, self.state, imgs))
                for i, r in enumerate(batch):
                    r.ids = [int(v) for v in ids[i]]
                with self._stats_lock:
                    self._served += len(batch)
                    self._dispatches += 1
                    self._batch_fill += len(batch)
                    self._lat_ms.append((time.monotonic() - t0) * 1000.0)
                    del self._lat_ms[:-512]  # rolling window
            except Exception as e:  # surface decode errors to every waiter
                for r in batch:
                    r.error = f"{type(e).__name__}: {e}"
            for r in batch:
                r.event.set()


def make_server(service: CaptionService, port: int = 8765,
                host: str = "127.0.0.1") -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, obj: dict) -> None:
            body = json.dumps(obj, ensure_ascii=False).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {
                    "status": "ok",
                    "batch": service.batch_size,
                    "max_wait_ms": service.max_wait * 1000.0,
                    **service.stats(),
                })
            else:
                self._send(404, {"error": "unknown path"})

        MAX_BODY = 32 * 1024 * 1024  # images only; reject absurd bodies

        def do_POST(self):
            if self.path != "/caption":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                self._send(400, {"error": "bad Content-Length"})
                return
            if n <= 0 or n > self.MAX_BODY:
                self._send(413, {"error": f"body must be 1..{self.MAX_BODY} bytes"})
                return
            try:
                data = self.rfile.read(n)
                self._send(200, service.caption_bytes(data))
            except ValueError as e:  # undecodable image = client error
                self._send(400, {"error": str(e)})
            except TimeoutError:
                self._send(503, {"error": "decode queue timeout"})
            except Exception as e:  # device/internal failure
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None) -> None:
    import argparse

    from myimagecaptioningmodel_tpu import config as config_mod

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", help="JSON config file")
    ap.add_argument("--bundle", default="infer")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--beam", type=int, default=0)
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--early-stop", action="store_true")
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--length-norm", type=float, default=0.0,
                    help="beam only: normalize final scores by len**alpha")
    args = ap.parse_args(argv)

    cfg = (
        config_mod.Config.from_json_file(args.config)
        if args.config
        else config_mod.default
    )
    service = CaptionService(
        cfg, args.bundle, args.batch, args.beam, args.quantize,
        args.early_stop, args.max_wait_ms, args.length_norm,
    )
    server = make_server(service, args.port, args.host)
    print(f"caption server on http://{args.host}:{args.port} "
          f"(batch {args.batch}, beam {args.beam})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.close()


if __name__ == "__main__":
    main()
