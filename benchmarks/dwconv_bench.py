"""Pallas dwconv3x3 vs XLA conv at the model's hot shapes (v5e).

The round-3 HLO/profile join puts the depthwise convs at <10% of HBM
peak under XLA (1.82 ms for a 123 MB C=86 dwconv). This measures the
Pallas stencil kernel (kernels/dwconv.py) against the XLA conv on the
exact serving shapes, chained timing + final D2H sync (the tunnel's
block_until_ready lies for Pallas custom calls — OPTIMIZATIONS.md).

  python benchmarks/dwconv_bench.py [tile_h ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fdn_tip2025_tpu.kernels.dwconv import (  # noqa: E402
    dwconv3x3, dwconv3x3_gate, gate_perm,
)
from fdn_tip2025_tpu.ops import conv2d, gelu  # noqa: E402

H, W = 640, 1120
ITERS = 30


def timed(fn, *args):
    """Chain ITERS calls inside ONE jit (fori_loop) — eager per-call
    dispatch through the axon tunnel costs ~10+ ms and swamps sub-ms
    kernels; a chained loop is one dispatch with serial device deps."""
    def chained(x, *rest):
        return jax.lax.fori_loop(
            0, ITERS, lambda i, y: fn(y, *rest), x)

    cj = jax.jit(chained)
    out = cj(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = cj(*args)
    _ = float(jnp.ravel(out)[0])  # real D2H sync
    return (time.perf_counter() - t0) / ITERS * 1e3  # ms


def main():
    tiles = [int(a) for a in sys.argv[1:]] or [8]
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    for c in (38, 86, 114, 172):
        x = jnp.asarray(rng.standard_normal((1, H, W, c)), dt)
        k = jnp.asarray(rng.standard_normal((3, 3, 1, c)) * 0.2, dt)
        gb = 2 * (H * W * c * 2) / 1e9  # read + write, bf16

        xla = jax.jit(lambda x, k: conv2d(x, k, None, padding=1,
                                          groups=x.shape[-1]))
        ms_x = timed(xla, x, k)
        print(f"C={c:4d} m=1   XLA {ms_x:7.3f} ms  {gb / ms_x * 1e3:6.0f} "
              f"GB/s", flush=True)
        for th in tiles:
            pal = jax.jit(lambda x, k, th=th: dwconv3x3(x, k, tile_h=th))
            try:
                ms_p = timed(pal, x, k)
            except Exception as e:  # noqa: BLE001
                print(f"          pallas th={th:3d} FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}")
                continue
            print(f"          pallas th={th:3d} {ms_p:7.3f} ms  "
                  f"{gb / ms_p * 1e3:6.0f} GB/s", flush=True)

    for c in (32, 86):  # FCAFFN / FDFFN gates
        x = jnp.asarray(rng.standard_normal((1, H, W, c)), dt)
        k2 = jnp.asarray(rng.standard_normal((3, 3, 1, 2 * c)) * 0.2, dt)
        gb = 2 * (H * W * c * 2) / 1e9

        def xla_gate(x, k2):
            g = conv2d(x, k2, None, padding=1, groups=x.shape[-1])
            g1, g2 = jnp.split(g, 2, axis=-1)
            return gelu(g1) * g2

        ms_x = timed(jax.jit(xla_gate), x, k2)
        print(f"C={c:4d} gate  XLA {ms_x:7.3f} ms  {gb / ms_x * 1e3:6.0f} "
              f"GB/s", flush=True)
        for th in tiles:
            pal = jax.jit(lambda x, k2, th=th: dwconv3x3_gate(
                x, k2, tile_h=th))
            try:
                ms_p = timed(pal, x, k2)
            except Exception as e:  # noqa: BLE001
                print(f"          pallas th={th:3d} FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}")
                continue
            print(f"          pallas th={th:3d} {ms_p:7.3f} ms  "
                  f"{gb / ms_p * 1e3:6.0f} GB/s", flush=True)
        # correctness on-chip (bf16): kernel vs XLA in permuted order
        ref = np.asarray(xla_gate(x, k2), np.float32)
        got = np.asarray(dwconv3x3_gate(x, k2), np.float32)
        err = np.abs(got - ref[..., gate_perm(c)]).max()
        print(f"          gate maxabs vs XLA: {err:.2e}")


if __name__ == "__main__":
    main()
