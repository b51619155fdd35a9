#!/usr/bin/env python
"""Ratio-sweep tool — equivalent of reference inference_fdn_multi_r.py
(:52-86): restore ONE image at ratios 0.00..0.99 step 0.01, writing
<output>/<r>.png, demonstrating user-controllable brightness.

TPU-first: the 100 ratios are batched through vmap-style batching (same
image replicated) instead of a Python loop of single forwards.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()  # FDN_DEVICE=cpu to force CPU (sitecustomize pins TPU)

from fdn_tip2025_tpu.inference import FDNPredictor  # noqa: E402
from fdn_tip2025_tpu.utils.img_io import imread, imwrite  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="single image path")
    ap.add_argument("--output", default="./multi_r")
    ap.add_argument("--fdn-ckpt", default=None)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=10)
    args = ap.parse_args()

    img = imread(args.input, float32=False)  # uint8 wire format
    pred = FDNPredictor(variant="lolblur", fdn_ckpt=args.fdn_ckpt)
    ratios = np.arange(args.steps) / args.steps
    for start in range(0, len(ratios), args.batch):
        chunk = ratios[start:start + args.batch]
        batch = np.repeat(img[None], len(chunk), axis=0)
        outs = pred.restore(batch, ratio=chunk.astype(np.float32),
                            output="uint8")
        for r, out in zip(chunk, outs):
            imwrite(out[..., ::-1],
                    os.path.join(args.output, f"{r:.2f}.png"))


if __name__ == "__main__":
    main()
