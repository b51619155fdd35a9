#!/usr/bin/env python
"""One-shot FID between two image folders — equivalent of the reference's
root fid.py (:12-18, pyiqa) and scripts/metrics FID trio:

  python tools/fid.py --dir1 results/FDN_lolblur --dir2 data/gt \
      --inception-weights inception_v3.pth

Weights are user-supplied (torchvision inception_v3 state dict) — no
pretrained blobs ship in this image; see metrics/inception.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()  # FDN_DEVICE=cpu to force CPU (sitecustomize pins TPU)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir1", required=True)
    ap.add_argument("--dir2", required=True)
    ap.add_argument("--inception-weights", required=True,
                    help="torchvision inception_v3 .pth")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from fdn_tip2025_tpu.metrics.fid import calculate_fid_folders
    from fdn_tip2025_tpu.metrics.inception import load_inception_feature_fn

    feature_fn = load_inception_feature_fn(args.inception_weights)
    fid = calculate_fid_folders(args.dir1, args.dir2, feature_fn,
                                batch=args.batch)
    print(f"FID: {fid:.4f}")


if __name__ == "__main__":
    main()
