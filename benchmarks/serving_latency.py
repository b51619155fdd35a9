"""End-to-end serving latency/throughput across resolutions.

Unlike bench.py (pure device forward at the LOL-Blur test size), this
drives the production FDNPredictor.restore() — LPNet ratio, x32
reflect pad, H2D/D2H, crop back — i.e. what a serving user sees per
request. Timed with a host-side numpy result (real D2H) per call.

  python benchmarks/serving_latency.py [bf16|f32] [f32|u8] [sizes...]

Second arg is the WIRE format: 'f32' ships float pixels (bf16-cast on
the host in bf16 mode) and fetches float, 'u8' ships uint8 and fetches
tensor2img-quantized uint8 (4x fewer wire bytes each way).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()  # honors FDN_DEVICE; persistent compile cache

import numpy as np  # noqa: E402


SIZES = [(400, 600), (640, 1120), (720, 1280), (1088, 1920)]


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    wire = sys.argv[2] if len(sys.argv) > 2 else "f32"
    sizes = ([tuple(int(v) for v in s.split("x")) for s in sys.argv[3:]]
             or SIZES)
    import jax.numpy as jnp
    from fdn_tip2025_tpu.inference import FDNPredictor

    dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
    pred = FDNPredictor(dtype=dtype)
    rng = np.random.default_rng(0)
    print(f"mode={mode} wire={wire} "
          f"(end-to-end restore(): LPNet + pad + H2D/D2H)", flush=True)
    for h, w in sizes:
        img = rng.random((h, w, 3), dtype=np.float32) * 0.3
        kw = {}
        if wire == "u8":
            img = (img * 255).round().astype(np.uint8)
            kw = dict(output="uint8")
        out = pred.restore(img, **kw)    # compile + warm this bucket
        assert out.shape == img.shape, (out.shape, img.shape)
        n = 4
        t0 = time.perf_counter()
        for _ in range(n):
            out = pred.restore(img, **kw)
        dt = (time.perf_counter() - t0) / n
        mp = h * w / 1e6
        print(f"  {h:4d}x{w:<4d} ({mp:4.2f} MP): {dt * 1e3:7.0f} ms/req "
              f"  {mp / dt:5.3f} MP/s", flush=True)


if __name__ == "__main__":
    main()
