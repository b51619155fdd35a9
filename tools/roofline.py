#!/usr/bin/env python
"""Roofline / MFU analysis of the FDN forward (VERDICT r1, item 4).

Compiles the exact bench.py forward (full FDN + LPNet ratio at LOL-Blur
1120x640) and reads XLA's own cost analysis (flops / bytes accessed),
then relates it to the measured single-chip device times and the v5e
hardware ceilings:

    v5e peak matmul:   197 TFLOP/s bf16 / ~98 TFLOP/s f32 (effective
                       measured on this tunneled chip: 117 TFLOP/s,
                       OPTIMIZATIONS.md 8192^3 probe)
    v5e HBM bandwidth: 819 GB/s

MFU = (model FLOPs / frame) / (measured device time * peak FLOP/s);
bandwidth bound = bytes accessed / 819 GB/s. Run on CPU (the HLO cost
model is backend-independent for flop counting): FDN_DEVICE=cpu
python tools/roofline.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fdn_tip2025_tpu.utils import platform as _platform  # noqa: E402

_platform.force_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

H, W = 640, 1120

# Measured v5e numbers (OPTIMIZATIONS.md round-3 mode table, chained
# timing protocol) and hardware ceilings.
MEASURED_MPS = {"parity": 0.399, "fast": 0.557, "bf16": 0.826}
PEAK_TFLOPS = {"parity": 117.0, "fast": 117.0, "bf16": 197.0}
HBM_GBPS = 819.0


def main():
    from fdn_tip2025_tpu.models import init_fdn, fdn_forward, init_ipredict
    from fdn_tip2025_tpu.models.ipredict import ipredict_forward

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    fdn_params = init_fdn(k1)
    lp_params = init_ipredict(k2)
    x = jnp.zeros((1, H, W, 3), jnp.float32)

    def fwd(fp, lp, x):
        ratio = ipredict_forward(lp, x.astype(jnp.float32))
        return fdn_forward(fp, x, ratio.astype(x.dtype))[0]

    print(f"compiling forward at {H}x{W} for cost analysis ...", flush=True)
    compiled = jax.jit(fwd).lower(fdn_params, lp_params, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    mp = H * W / 1e6
    report = {
        "resolution": f"{H}x{W}",
        "model_flops_per_frame": flops,
        "model_gflops_per_frame": round(flops / 1e9, 2),
        "bytes_accessed_per_frame_gb": round(bytes_acc / 1e9, 3),
        "hbm_bound_ms": round(bytes_acc / (HBM_GBPS * 1e9) * 1e3, 2),
        "modes": {},
    }
    for mode, mps in MEASURED_MPS.items():
        dt = mp / mps  # seconds / frame
        peak = PEAK_TFLOPS[mode] * 1e12
        report["modes"][mode] = {
            "measured_mps": mps,
            "device_ms_per_frame": round(dt * 1e3, 1),
            "matmul_peak_ms_per_frame": round(flops / peak * 1e3, 2),
            "mfu_pct": round(flops / (dt * peak) * 100, 2),
            "hbm_utilization_pct": round(
                bytes_acc / (dt * HBM_GBPS * 1e9) * 100, 1),
        }
    print(json.dumps(report, indent=1))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "artifacts",
        "roofline.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
