#!/usr/bin/env python
"""Measure the PyTorch reference's FDN inference throughput on this host.

The reference publishes no speed numbers (BASELINE.md), so the baseline
for bench.py is measured here: the reference FDN forward (with LPNet
ratio prediction, mirroring inference_fdn_lolblur.py:65-71) on torch CPU
at LOL-Blur resolution. Run once; record the MP/s into bench.py's
FDN_TORCH_BASELINE_MPS.
"""

import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.torch_ref import import_ref_arch  # noqa: E402

# Full LOL-Blur resolution takes >9 min/forward on this 1-core torch CPU;
# measure at quarter resolution and report MP/s (cost is ~linear in pixels,
# slightly favorable to torch at smaller sizes).
H, W = 320, 576


def main():
    ARCH = import_ref_arch("FDN_arch")
    LP = import_ref_arch("LPNet_arch")
    mar = ARCH.MAR(use_ratio=True)
    orig = torch.load
    torch.load = lambda *a, **k: {"params": mar.state_dict()}
    fdn = ARCH.FDN().eval()
    torch.load = orig
    lpnet = LP.I_predict_net().eval()
    x = torch.from_numpy(
        np.random.default_rng(0).random((1, 3, H, W), dtype=np.float32))
    with torch.no_grad():
        t0 = time.perf_counter()
        ratio = lpnet(x)
        fdn(x, ratio_i=ratio)
        dt = time.perf_counter() - t0
        print(f"warmup: {dt:.1f}s")
        iters = max(1, min(5, int(120 / dt)))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            ratio = lpnet(x)
            fdn(x, ratio_i=ratio)
            times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    print(f"torch-cpu FDN forward {H}x{W}: {dt:.2f}s/img = "
          f"{H * W / 1e6 / dt:.4f} MP/s over {iters} iters")


if __name__ == "__main__":
    main()
