"""Host data-pipeline throughput: cv2/Python chain vs the native C++
loader (decode + pad + crop + augment + normalize), LOL-Blur-like inputs
(1120x640 PNGs, crop 128 — options/train/FDN.yml geometry).

  python benchmarks/native_loader_bench.py [n_images] [crop]
"""

import os
import sys
import tempfile
import time

import numpy as np
import cv2

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu import native
from fdn_tip2025_tpu.data.paired_dataset import PairedImageDataset

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
CROP = int(sys.argv[2]) if len(sys.argv) > 2 else 128


def main():
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="fdn_loader_bench_")
    for i in range(N):
        img = rng.integers(0, 256, (640, 1120, 3), np.uint8)
        cv2.imwrite(os.path.join(tmp, f"img_{i:03d}.png"), img)
    pat = os.path.join(tmp, "img_*.png")
    base = {"dataroot_gt": pat, "dataroot_lq": pat, "phase": "train",
            "gt_size": CROP}

    def run(ds, label, reps=3):
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            for i in range(N):
                ds.__getitem__(i, rng=np.random.default_rng(i))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:24s} {N / best:7.2f} samples/s "
              f"({best / N * 1e3:6.1f} ms/sample)")
        return N / best

    py = run(PairedImageDataset(dict(base, native=False)), "python (cv2)")
    if not native.available():
        print("native loader unavailable; stopping")
        return
    nat = run(PairedImageDataset(dict(base)), "native per-sample")

    paths = sorted(__import__("glob").glob(pat))
    t_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        native.load_batch(paths, paths, [0] * N, [0] * N, CROP,
                          [0] * N, [1] * N, [1] * N)
        t_best = min(t_best, time.perf_counter() - t0)
    bat = N / t_best
    print(f"{'native batch call':24s} {bat:7.2f} samples/s "
          f"({t_best / N * 1e3:6.1f} ms/sample)")
    print(f"native/python speedup: per-sample {nat / py:.2f}x, "
          f"batch {bat / py:.2f}x")


if __name__ == "__main__":
    main()
