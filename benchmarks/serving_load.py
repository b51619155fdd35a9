"""Sustained mixed-traffic load test of the HTTP serving daemon.

Spins up the production stack in-process (FDNPredictor bf16 + pipelined
MicroBatcher + ThreadingHTTPServer), fires N requests of mixed sizes
from C concurrent clients, and reports p50/p95 latency per bucket plus
aggregate MP/s and the daemon's own stats.

  python benchmarks/serving_load.py [N=40] [CLIENTS=4]
"""

import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()

import numpy as np  # noqa: E402


SIZES = [(400, 600), (640, 1120)]


def main():
    import cv2
    import jax.numpy as jnp

    from fdn_tip2025_tpu.inference import FDNPredictor
    from fdn_tip2025_tpu.serving import MicroBatcher, make_http_server

    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    clients = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    pred = FDNPredictor(dtype=jnp.bfloat16)
    mb = MicroBatcher(pred, max_batch=4, window_ms=8.0, output="uint8")
    srv = make_http_server(mb, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    rng = np.random.default_rng(0)
    bodies = []
    for h, w in SIZES:
        img = (rng.random((h, w, 3)) * 76).astype(np.uint8)
        ok, png = cv2.imencode(".png", img)
        assert ok
        bodies.append(((h, w), png.tobytes()))

    def post(body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/restore", data=body, method="POST")
        with urllib.request.urlopen(req, timeout=600) as resp:
            assert resp.status == 200
            resp.read()

    print("warming (compile per bucket x pow2 batch) ...", flush=True)
    for (h, w), body in bodies:
        b = 1
        while True:  # mirror serve.py --warmup-hw: all pow2 batch sizes
            pred.restore(np.zeros((b, h, w, 3), np.uint8), output="uint8")
            if b >= mb.max_batch:
                break
            b = min(b * 2, mb.max_batch)
        post(body)  # HTTP path end-to-end

    lat = {hw: [] for hw, _ in bodies}
    lock = threading.Lock()
    work = [(i % len(bodies)) for i in range(n_req)]
    widx = iter(range(n_req))

    def client():
        while True:
            with lock:
                try:
                    i = next(widx)
                except StopIteration:
                    return
            hw, body = bodies[work[i]]
            t0 = time.perf_counter()
            post(body)
            dt = time.perf_counter() - t0
            with lock:
                lat[hw].append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    total_mp = sum(h * w / 1e6 * len(lat[(h, w)]) for h, w in
                   (hw for hw, _ in bodies))
    print(f"{n_req} requests, {clients} clients, mixed "
          f"{'/'.join(f'{h}x{w}' for h, w in (hw for hw, _ in bodies))}: "
          f"{wall:.1f}s wall, {total_mp / wall:.3f} MP/s aggregate")
    for (h, w), ds in lat.items():
        ds = sorted(ds)
        p50 = ds[len(ds) // 2]
        p95 = ds[min(len(ds) - 1, int(len(ds) * 0.95))]
        print(f"  {h:4d}x{w:<4d}: n={len(ds)}  p50 {p50*1e3:6.0f} ms  "
              f"p95 {p95*1e3:6.0f} ms")
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10) as resp:
        print("healthz:", resp.read().decode())
    srv.shutdown()
    mb.close()


if __name__ == "__main__":
    main()
