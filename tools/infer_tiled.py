#!/usr/bin/env python
"""High-resolution tiled inference (throughput mode).

The reference's grids/grids_inverse crop-and-stitch protocol
(image_restoration_model.py:261-339, val.crop_size_{h,w}) generalized to
TPU: tiles are restored in mesh-sharded batches (multi-chip data parallel
over the "data" axis) and stitched with count-matrix averaging — the
"batched 4K tiled inference" configuration of BASELINE.json.

  python tools/infer_tiled.py --input photo_4k.png --output out.png \
      --crop 384 --batch 8 --fdn-ckpt FDN_lolblur.pth
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()

import jax  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--crop", type=int, default=384,
                    help="tile size (multiple of 32)")
    ap.add_argument("--batch", type=int, default=None,
                    help="tiles per forward (defaults to #devices)")
    ap.add_argument("--fdn-ckpt", default=None)
    ap.add_argument("--lpnet-ckpt",
                    default="/root/reference/checkpoint/LPNet_lolblur.pth")
    ap.add_argument("--ratio", type=float, default=None,
                    help="fixed brightness ratio (else LPNet on the "
                         "full image, downscaled)")
    args = ap.parse_args()
    if args.crop % 32:
        raise SystemExit("--crop must be a multiple of 32")

    from fdn_tip2025_tpu.inference import FDNPredictor
    from fdn_tip2025_tpu.parallel.mesh import make_mesh
    from fdn_tip2025_tpu.parallel.spatial import tiled_restore
    from fdn_tip2025_tpu.utils.img_io import imread, imwrite, tensor2img
    from fdn_tip2025_tpu.models import fdn_forward
    from fdn_tip2025_tpu.ops import interp_bilinear

    import jax.numpy as jnp

    mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    batch = args.batch or n_dev
    pred = FDNPredictor(variant="lolblur", fdn_ckpt=args.fdn_ckpt,
                        lpnet_ckpt=args.lpnet_ckpt)
    # uint8 wire: tiles ship 1 B/px (a 4K image is ~100 MB as f32 tiles
    # plus overlap — transfer dominates behind a thin pipe); normalize
    # runs on-device inside fwd. Stitching stays f32 (count averaging).
    img_u8 = imread(args.input, float32=False)
    img = img_u8.astype(np.float32) / 255.0

    if args.ratio is not None:
        ratio = float(args.ratio)
    else:
        # LPNet on a bounded-size thumbnail of the whole image — the ratio
        # is global, not per tile
        thumb = img
        while max(thumb.shape[:2]) > 1024:
            thumb = np.asarray(interp_bilinear(
                jnp.asarray(thumb)[None], 0.5))[0]
        ratio = float(pred.predict_ratio(thumb)[0, 0])
    print(f"mesh={n_dev} devices, ratio={ratio:.4f}, "
          f"tiles {args.crop}x{args.crop} x{batch}/step")

    rj = jnp.full((batch, 1), ratio, jnp.float32)

    @jax.jit
    def fwd(tiles):
        x = tiles.astype(jnp.float32) / 255.0
        return fdn_forward(pred.fdn_params, x, rj)[0]

    out = tiled_restore(fwd, img_u8, args.crop, args.crop,
                        batch_size=batch, mesh=mesh)
    imwrite(tensor2img(out), args.output)
    print(f"wrote {args.output} ({img.shape[0]}x{img.shape[1]})")


if __name__ == "__main__":
    main()
