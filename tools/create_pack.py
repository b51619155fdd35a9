#!/usr/bin/env python
"""Build an FDNPack single-file dataset from an image glob.

The working analog of the reference's LMDB builders
(basicsr/utils/create_lmdb.py:24-127, lmdb_util.py:9-208): turns a
thousands-of-small-files dataset into one sequentially-readable file
(raw encoded bytes + JSON index — no lmdb dependency). Consume with
`io_backend: {type: pack, pack_lq: ..., pack_gt: ...}` in a dataset
config, or FileClient(backend='pack', pack_path=...).

  python tools/create_pack.py --input 'data/train/low_blur/*/*.png' \
      --root data/train/low_blur --output data/train/low_blur.fdnpack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.data.pack import write_pack  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="image glob")
    ap.add_argument("--output", required=True, help=".fdnpack path")
    ap.add_argument("--root", default=None,
                    help="keys become paths relative to this root "
                         "(default: basenames)")
    args = ap.parse_args()
    keys = write_pack(args.input, args.output, root=args.root)
    size = os.path.getsize(args.output)
    print(f"packed {len(keys)} files -> {args.output} "
          f"({size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
