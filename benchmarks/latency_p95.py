"""Single-image serving latency: p50/p95 + the spatial-mode datapoint.

VERDICT-r2 #5: throughput got the round-2 attention; per-request latency
is the user-facing number. This measures what one user waits for one
1120x640 image, end to end (FDNPredictor.restore(): LPNet ratio folded
into the SAME program as the restore — one dispatch, one H2D, one D2H),
and records the `spatial=True` program's single-chip cost so the 8-chip
latency split has a measured starting point (multi-chip hardware is not
reachable from this image; the spatial program itself is validated on
the 8-virtual-device mesh in tests/test_spatial_trained.py and the
driver dryrun).

  python benchmarks/latency_p95.py [N=20] [--out artifacts/...json]

Rows:
  * bf16 + uint8 wire, plain        — production single-request path
  * bf16 + f32 wire                 — wire-format cost split
  * bf16 + uint8, spatial mesh(1)   — the GSPMD-partitioned program on
                                      one chip: its overhead vs plain is
                                      the fixed cost the 8-way split
                                      must amortize

Reference protocol being timed: inference_fdn_lolblur.py:39-75 (load ->
LPNet ratio -> FDN -> save, per image).
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()

import numpy as np  # noqa: E402

H, W = 640, 1120


def _time_requests(pred, img, n, **kw):
    pred.restore(img, **kw)  # compile + warm this bucket
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        pred.restore(img, **kw)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    # nearest-rank p95 (ADVICE r3: int(n*0.95) was just the max for n=20)
    p95_idx = max(0, math.ceil(0.95 * len(ts)) - 1)
    return {
        "p50_ms": round(ts[len(ts) // 2] * 1e3, 1),
        "p95_ms": round(ts[p95_idx] * 1e3, 1),
        "mean_ms": round(sum(ts) / len(ts) * 1e3, 1),
        "mp_s": round((H * W / 1e6) / (sum(ts) / len(ts)), 3),
    }


def main():
    # parse argv once: pop --out and its value, the remainder is [N]
    # (ADVICE r3: the old filter kept --out's value and int() crashed)
    argv = list(sys.argv[1:])
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            raise SystemExit("--out requires a path argument")
        out_path = argv[i + 1]
        del argv[i:i + 2]
    n = int(argv[0]) if argv else 20

    import jax.numpy as jnp
    from fdn_tip2025_tpu.inference import FDNPredictor
    from fdn_tip2025_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    img_f = (rng.random((H, W, 3), dtype=np.float32) * 0.3)
    img_u8 = (img_f * 255).round().astype(np.uint8)

    rows = {}
    pred = FDNPredictor(dtype=jnp.bfloat16)
    rows["bf16_u8_plain"] = _time_requests(pred, img_u8, n, output="uint8")
    print("bf16_u8_plain", rows["bf16_u8_plain"], flush=True)
    rows["bf16_f32wire_plain"] = _time_requests(pred, img_f, n)
    print("bf16_f32wire_plain", rows["bf16_f32wire_plain"], flush=True)
    del pred

    sp = FDNPredictor(dtype=jnp.bfloat16, mesh=make_mesh(1), spatial=True)
    rows["bf16_u8_spatial_mesh1"] = _time_requests(
        sp, img_u8, n, output="uint8")
    print("bf16_u8_spatial_mesh1", rows["bf16_u8_spatial_mesh1"], flush=True)

    record = {
        "what": ("single-image FDNPredictor.restore() latency at 1120x640 "
                 "(LPNet+restore fused in ONE program: one dispatch/H2D/"
                 "D2H), via the tunneled v5e backend; "
                 "benchmarks/latency_p95.py"),
        "n_requests": n,
        "pallas_dw": os.environ.get("FDN_PALLAS_DW") == "1",
        "rows": rows,
        "spatial_overhead_ms": round(
            rows["bf16_u8_spatial_mesh1"]["p50_ms"]
            - rows["bf16_u8_plain"]["p50_ms"], 1),
        "date": time.strftime("%Y-%m-%d"),
    }
    print(json.dumps(record, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
