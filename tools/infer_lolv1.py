#!/usr/bin/env python
"""LOL-v1 inference — equivalent of reference inference_fdn_lolv1.py:
FDN_lolv1 (dim=24) with ratio = mean(gray(img)) / LPNet(img)
(inference_fdn_lolv1.py:58-64)."""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()  # FDN_DEVICE=cpu to force CPU (sitecustomize pins TPU)

import jax.numpy as jnp  # noqa: E402

from fdn_tip2025_tpu.inference import FDNPredictor  # noqa: E402
from fdn_tip2025_tpu.utils.img_io import imread, imwrite  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--fdn-ckpt", default=None)
    ap.add_argument("--lpnet-ckpt",
                    default="/root/reference/checkpoint/LPNet_lolv1.pth")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="serving dtype (bfloat16 = validated "
                         "production mode, 43.5 dB vs f32)")
    args = ap.parse_args()

    pred = FDNPredictor(variant="lolv1", fdn_ckpt=args.fdn_ckpt,
                        lpnet_ckpt=args.lpnet_ckpt,
                        dtype=jnp.dtype(args.dtype))
    for path in sorted(glob.glob(args.input)):
        # uint8 wire format (device-side normalize/quantize; validated
        # vs the f32 wire — see cross_check_u8_r2.json)
        out = pred.restore(imread(path, float32=False), output="uint8")
        imwrite(out[..., ::-1],
                os.path.join(args.output, os.path.basename(path)))


if __name__ == "__main__":
    main()
