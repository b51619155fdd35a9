"""Production serving: HTTP daemon around FDNPredictor with dynamic
micro-batching.

TPU-native serving design (no reference analog — the reference's
deployment story is batch scripts, inference_fdn_lolblur.py):

  * requests are grouped by padded x32 bucket shape, so every batch hits
    an already-compiled XLA program (FDNPredictor's jit cache);
  * a micro-batcher collects same-bucket requests for up to
    `window_ms` (first request pays the latency; followers ride the
    batch) bounded by `max_batch`;
  * with a mesh, batches are sharded over devices by FDNPredictor
    (params replicated, batch zero-padded to a mesh multiple).

The daemon is stdlib-only (ThreadingHTTPServer): POST /restore with an
image body (PNG/JPEG, anything cv2 decodes), optional `?ratio=`
overriding the LPNet ratio; GET /healthz for liveness.
"""

import json
import queue
import threading
import time

import numpy as np


def _bucket_shape(h, w):
    """Pad-to-x32 bucket (the jit-cache key FDNPredictor will land on;
    protocol: reference image_restoration_model.py:581-583)."""
    return (-(-h // 32) * 32, -(-w // 32) * 32)


class _Pending:
    __slots__ = ("img", "ratio", "event", "out", "error", "abandoned")

    def __init__(self, img, ratio):
        self.img = img
        self.ratio = ratio
        self.event = threading.Event()
        self.out = None
        self.error = None
        self.abandoned = False  # client timed out; shed instead of serve


class MicroBatcher:
    """Groups same-bucket requests into predictor batches.

    One worker thread: drains the queue, groups by (bucket, has_ratio),
    waits up to window_ms for followers, runs the predictor once per
    group. Mixed-shape traffic never blocks a group (different buckets
    are dispatched on consecutive drains).
    """

    def __init__(self, predictor, max_batch=8, window_ms=5.0,
                 output="float32", pipeline_depth=2,
                 tile_above_px=None, tile_crop=384):
        self.predictor = predictor
        self.max_batch = int(max_batch)
        self.window_ms = float(window_ms)
        self.output = output  # predictor output dtype ('uint8' = 1 B/px D2H)
        # beyond-bucket requests (> tile_above_px pixels) bypass batching
        # and run the grids-protocol tiled restore instead of compiling
        # (and possibly OOMing) a fresh huge bucket
        self.tile_above_px = tile_above_px
        self.tile_crop = int(tile_crop)
        # dispatch pool: restore() blocks on the D2H fetch, so running
        # `pipeline_depth` group dispatches concurrently lets batch N+1's
        # H2D/compute overlap batch N's compute/D2H on the device stream
        # (groups are independent; completion order is irrelevant)
        import concurrent.futures as cf
        self._pool = cf.ThreadPoolExecutor(max(1, int(pipeline_depth)))
        self.q = queue.Queue()
        # requests = served requests; images = device dispatch sizes
        # (incl. pow2 padding, so images-requests = padding overhead);
        # tiled = oversize requests routed around batching; shed =
        # abandoned (timed-out) requests dropped before dispatch
        self.stats = {"requests": 0, "batches": 0, "images": 0,
                      "tiled": 0, "shed": 0}
        self._stats_lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, img, ratio=None, timeout=600.0):
        """img: (H, W, 3) float32 [0,1] or uint8. Blocks until the batch
        runs (oversize images run tiled immediately on this thread).
        timeout must cover a first-request jit compile of a new x32
        bucket (minutes on a cold cache), not just the steady state."""
        if (self.tile_above_px
                and img.shape[0] * img.shape[1] > self.tile_above_px):
            out = self.predictor.restore_tiled(
                img, crop=self.tile_crop, ratio=ratio, output=self.output)
            with self._stats_lock:
                self.stats["requests"] += 1
                self.stats["tiled"] += 1
            return out
        p = _Pending(img, ratio)
        self.q.put(p)
        if not p.event.wait(timeout):
            # mark abandoned so the worker sheds it instead of spending a
            # device forward on a waiter that already got its 503 —
            # otherwise overload backlogs never drain
            p.abandoned = True
            raise TimeoutError("restore timed out")
        if p.error is not None:
            raise p.error
        return p.out

    def close(self):
        self._stop.set()
        self.q.put(None)  # wake the worker
        self._thread.join(timeout=5)
        self._pool.shutdown(wait=True)

    # ------------------------------------------------------------------
    def _key(self, p):
        return (_bucket_shape(*p.img.shape[:2]), p.ratio is not None,
                p.img.dtype == np.uint8)

    def _run(self):
        while not self._stop.is_set():
            first = self.q.get()
            if first is None:
                continue
            group = [first]
            key = self._key(first)
            deadline = time.monotonic() + self.window_ms / 1e3
            leftovers = []
            while len(group) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    p = self.q.get(timeout=remaining)
                except queue.Empty:
                    break
                if p is None:
                    continue
                if self._key(p) == key:
                    group.append(p)
                else:
                    leftovers.append(p)
            for p in leftovers:  # different bucket: next drain
                self.q.put(p)
            self._pool.submit(self._dispatch, group, key)

    def _dispatch(self, group, key):
        (bh, bw), with_ratio, _u8 = key
        # shed abandoned waiters (client already got its 503): spending
        # a multi-second device forward on them keeps the backlog from
        # ever draining under overload
        live = [p for p in group if not p.abandoned]
        shed = len(group) - len(live)
        dispatched = 0
        if live:
            try:
                # pad every image of the bucket to the exact bucket shape
                # so they stack (reflect-pad like the x32 protocol; the
                # predictor's own x32 pad is then a no-op) and crop back.
                padded = np.stack([
                    np.pad(p.img,
                           ((0, bh - p.img.shape[0]),
                            (0, bw - p.img.shape[1]), (0, 0)),
                           mode="reflect")
                    for p in live])
                # batch-size bucketing: pad the group to the next power
                # of two (capped at max_batch) by repeating the last
                # image — the jit program is keyed on the batch dim, so
                # without this every distinct group size compiles its own
                # program (measured: a mid-traffic compile spikes p95 to
                # minutes).
                n = len(live)
                target = min(1 << (n - 1).bit_length(), self.max_batch)
                if target > n:
                    padded = np.concatenate(
                        [padded,
                         np.repeat(padded[-1:], target - n, axis=0)])
                dispatched = len(padded)
                ratios = None
                if with_ratio:
                    ratios = [p.ratio for p in live]
                    ratios += [0.5] * (len(padded) - n)
                out = self.predictor.restore(
                    padded, ratio=np.asarray(ratios, np.float32)
                    if with_ratio else None, output=self.output)
                for p, o in zip(live, out[:n]):
                    p.out = o[:p.img.shape[0], :p.img.shape[1]]
            except Exception as e:  # noqa: BLE001 — propagate to waiters
                for p in live:
                    p.error = e
        with self._stats_lock:  # dispatches run on pool threads
            self.stats["requests"] += len(live)
            self.stats["images"] += dispatched
            self.stats["batches"] += 1 if live else 0
            self.stats["shed"] += shed
        for p in live:
            p.event.set()


def make_http_server(batcher, host="0.0.0.0", port=8700,
                     max_body_bytes=64 << 20):
    """ThreadingHTTPServer: POST /restore (image body -> PNG),
    GET /healthz (JSON liveness + batcher stats). Bodies over
    max_body_bytes (default 64 MiB — a 16 MP PNG is well under) are
    rejected with 413 before being read into memory."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import urlparse, parse_qs

    import cv2

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet access log
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path != "/healthz":
                return self._send(404, b'{"error": "not found"}')
            info = {"status": "ok", **batcher.stats}
            self._send(200, json.dumps(info).encode())

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/restore":
                return self._send(404, b'{"error": "not found"}')
            n = int(self.headers.get("Content-Length", 0))
            if n <= 0:
                return self._send(400, b'{"error": "empty body"}')
            if n > max_body_bytes:
                return self._send(413, b'{"error": "body too large"}')
            raw = self.rfile.read(n)
            buf = cv2.imdecode(np.frombuffer(raw, np.uint8),
                               cv2.IMREAD_COLOR)
            if buf is None:
                return self._send(400, b'{"error": "undecodable image"}')
            qs = parse_qs(url.query)
            ratio = (float(qs["ratio"][0]) if "ratio" in qs else None)
            # uint8 stays uint8 on the wire: normalize/quantize run
            # on-device (4x fewer host<->device bytes than f32)
            img = np.ascontiguousarray(buf[..., ::-1])  # BGR->RGB
            try:
                out = batcher.submit(img, ratio)
            except TimeoutError as e:
                return self._send(
                    503, json.dumps({"error": repr(e)}).encode())
            except Exception as e:  # noqa: BLE001 — report to client
                return self._send(
                    500, json.dumps({"error": repr(e)}).encode())
            if out.dtype == np.uint8:
                out8 = out
            else:
                out8 = np.clip(np.round(out * 255.0), 0,
                               255).astype(np.uint8)
            ok, png = cv2.imencode(".png", out8[..., ::-1])  # RGB->BGR
            if not ok:
                return self._send(500, b'{"error": "encode failed"}')
            self._send(200, png.tobytes(), "image/png")

    return ThreadingHTTPServer((host, port), Handler)
