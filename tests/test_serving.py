"""Serving daemon: micro-batcher grouping + HTTP surface.

Uses a toy predictor (FDNPredictor.restore semantics: (B,H,W,3) float32
in/out) — the network itself is covered by the parity/inference tests;
here the unit under test is the batching/bucketing/HTTP plumbing.
"""

import threading
import urllib.request

import numpy as np
import pytest

from fdn_tip2025_tpu.serving import MicroBatcher, make_http_server


class ToyPredictor:
    def __init__(self):
        self.calls = []

    def restore(self, imgs, ratio=None, output="float32"):
        self.calls.append((imgs.shape, None if ratio is None
                           else np.asarray(ratio).shape))
        x = (imgs.astype(np.float32) / 255.0
             if imgs.dtype == np.uint8 else imgs)
        out = np.tanh(x * 2.0)
        if ratio is not None:
            out = out + np.asarray(ratio, np.float32).reshape(-1, 1, 1, 1)
        if output == "uint8":
            return np.round(np.clip(out, 0, 1) * 255.0).astype(np.uint8)
        return out


def _expected(img, ratio=None):
    out = np.tanh(img * 2.0)
    return out if ratio is None else out + ratio


def test_microbatcher_groups_same_bucket(rng):
    pred = ToyPredictor()
    mb = MicroBatcher(pred, max_batch=4, window_ms=60.0)
    try:
        imgs = [rng.random((30, 40, 3), dtype=np.float32)
                for _ in range(4)]
        outs = [None] * 4

        def worker(i):
            outs[i] = mb.submit(imgs[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for img, out in zip(imgs, outs):
            assert out.shape == img.shape
            np.testing.assert_allclose(out, _expected(img), atol=1e-6)
        # all four images rode ONE predictor call, padded to the bucket
        assert pred.calls == [((4, 32, 64, 3), None)]
        assert mb.stats["batches"] == 1 and mb.stats["images"] == 4
    finally:
        mb.close()


def test_microbatcher_mixed_buckets_and_ratio(rng):
    pred = ToyPredictor()
    mb = MicroBatcher(pred, max_batch=4, window_ms=10.0)
    try:
        a = rng.random((30, 40, 3), dtype=np.float32)   # bucket 32x64
        b = rng.random((70, 40, 3), dtype=np.float32)   # bucket 96x64
        outs = {}

        def worker(k, img, ratio):
            outs[k] = mb.submit(img, ratio)

        threads = [threading.Thread(target=worker, args=args) for args in
                   [("a", a, None), ("b", b, None), ("ar", a, 0.25)]]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        np.testing.assert_allclose(outs["a"], _expected(a), atol=1e-6)
        np.testing.assert_allclose(outs["b"], _expected(b), atol=1e-6)
        np.testing.assert_allclose(outs["ar"], _expected(a, 0.25),
                                   atol=1e-6)
        # three incompatible groups -> three predictor calls
        assert mb.stats["batches"] == 3
    finally:
        mb.close()


def test_microbatcher_uint8_wire(rng):
    """uint8 requests group together (never stacked with f32 ones) and a
    uint8-output batcher returns quantized images."""
    pred = ToyPredictor()
    mb = MicroBatcher(pred, max_batch=4, window_ms=30.0, output="uint8")
    try:
        u8 = (rng.random((30, 40, 3)) * 255).astype(np.uint8)
        f32 = rng.random((30, 40, 3), dtype=np.float32)
        outs = {}

        def worker(k, img):
            outs[k] = mb.submit(img)

        threads = [threading.Thread(target=worker, args=args)
                   for args in [("u", u8), ("f", f32), ("u2", u8)]]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # same bucket but different wire dtype -> separate batches
        assert mb.stats["batches"] == 2
        exp = np.round(np.clip(_expected(u8.astype(np.float32) / 255.0),
                               0, 1) * 255.0).astype(np.uint8)
        np.testing.assert_array_equal(outs["u"], exp)
        np.testing.assert_array_equal(outs["u2"], exp)
        assert outs["f"].dtype == np.uint8  # batcher-level output dtype
    finally:
        mb.close()


def test_microbatcher_batch_size_bucketing(rng):
    """Groups pad to the next power-of-two batch (capped at max_batch):
    the jit program is keyed on the batch dim, so free sizes would
    compile per distinct group size (measured minutes-long p95 spikes)."""
    pred = ToyPredictor()
    mb = MicroBatcher(pred, max_batch=8, window_ms=60.0)
    try:
        imgs = [rng.random((16, 16, 3), dtype=np.float32)
                for _ in range(3)]
        outs = [None] * 3

        def worker(i):
            outs[i] = mb.submit(imgs[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # 3 requests ride ONE call padded to batch 4 (next pow2)
        assert pred.calls == [((4, 32, 32, 3), None)]
        for img, out in zip(imgs, outs):
            np.testing.assert_allclose(out, _expected(img), atol=1e-6)
    finally:
        mb.close()


def test_microbatcher_tiled_route(rng):
    """Oversize requests bypass batching and run the tiled restore."""
    class TiledToy(ToyPredictor):
        def __init__(self):
            super().__init__()
            self.tiled_calls = []

        def restore_tiled(self, img, crop=384, ratio=None,
                          output="float32"):
            self.tiled_calls.append((img.shape, crop))
            return self.restore(img[None], ratio=None,
                                output=output)[0]

    pred = TiledToy()
    mb = MicroBatcher(pred, max_batch=2, window_ms=1.0,
                      tile_above_px=32 * 32, tile_crop=32)
    try:
        big = rng.random((40, 40, 3), dtype=np.float32)
        small = rng.random((16, 16, 3), dtype=np.float32)
        out_big = mb.submit(big)
        out_small = mb.submit(small)
        assert pred.tiled_calls == [((40, 40, 3), 32)]
        np.testing.assert_allclose(out_big, _expected(big), atol=1e-6)
        np.testing.assert_allclose(out_small, _expected(small), atol=1e-6)
        assert mb.stats["batches"] == 1  # only the small one batched
        assert mb.stats["tiled"] == 1  # the big one is counted too
        assert mb.stats["requests"] == 2
    finally:
        mb.close()


def test_microbatcher_sheds_timed_out_requests(rng):
    """A request whose client timed out (got its 503) must NOT be run on
    the device later — otherwise the backlog never drains under
    overload."""
    import time

    release = threading.Event()

    class SlowToy(ToyPredictor):
        def restore(self, imgs, ratio=None, output="float32"):
            release.wait(10)  # hold the single dispatch slot
            return super().restore(imgs, ratio, output)

    pred = SlowToy()
    mb = MicroBatcher(pred, max_batch=2, window_ms=1.0, pipeline_depth=1)
    try:
        img = rng.random((8, 8, 3), dtype=np.float32)
        slow = threading.Thread(target=lambda: mb.submit(img))
        slow.start()  # occupies the dispatch pool
        time.sleep(0.1)
        # second request: queued behind the slow dispatch, abandoned
        with pytest.raises(TimeoutError):
            mb.submit(img, timeout=0.2)
        release.set()
        slow.join(timeout=10)
        deadline = time.monotonic() + 5
        while mb.stats["shed"] < 1 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert mb.stats["shed"] == 1
        assert mb.stats["requests"] == 1  # only the served one
        assert len(pred.calls) == 1  # no device call for the shed one
    finally:
        release.set()
        mb.close()


def test_microbatcher_propagates_errors(rng):
    class Boom:
        def restore(self, imgs, ratio=None, output="float32"):
            raise RuntimeError("boom")

    mb = MicroBatcher(Boom(), max_batch=2, window_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            mb.submit(rng.random((8, 8, 3), dtype=np.float32))
    finally:
        mb.close()


def test_http_server_roundtrip(rng):
    import cv2

    pred = ToyPredictor()
    mb = MicroBatcher(pred, max_batch=2, window_ms=1.0)
    srv = make_http_server(mb, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        img8 = (rng.random((24, 40, 3)) * 255).astype(np.uint8)
        ok, png = cv2.imencode(".png", img8[..., ::-1])  # write BGR
        assert ok

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/restore?ratio=0.1",
            data=png.tobytes(), method="POST")
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.headers["Content-Type"] == "image/png"
            out8 = cv2.imdecode(
                np.frombuffer(resp.read(), np.uint8),
                cv2.IMREAD_COLOR)[..., ::-1]
        expected = _expected(img8.astype(np.float32) / 255.0, 0.1)
        expected8 = np.clip(np.round(expected * 255.0), 0, 255)
        assert out8.shape == img8.shape
        assert np.abs(out8.astype(np.float32) - expected8).max() <= 1

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as resp:
            assert b'"status": "ok"' in resp.read()
    finally:
        srv.shutdown()
        mb.close()


def test_http_server_body_limits(rng):
    pred = ToyPredictor()
    mb = MicroBatcher(pred, max_batch=2, window_ms=1.0)
    srv = make_http_server(mb, host="127.0.0.1", port=0,
                           max_body_bytes=64)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        import urllib.error

        def post(data):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/restore", data=data,
                method="POST")
            try:
                with urllib.request.urlopen(req, timeout=10) as resp:
                    return resp.status
            except urllib.error.HTTPError as e:
                return e.code

        assert post(b"x" * 100) == 413   # over max_body_bytes
        assert post(b"") == 400          # empty body
        assert post(b"notanimage") == 400
    finally:
        srv.shutdown()
        mb.close()
