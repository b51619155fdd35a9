#!/usr/bin/env python
"""Export an AOT serving artifact (.fdnx): the exact compiled serving
programs + weights in one file (fdn_tip2025_tpu/export.py).

  python tools/export_model.py --fdn-ckpt net_g_500000.pth \
      --lpnet-ckpt LPNet_lolblur.pth --dtype bfloat16 \
      --sizes 640x1120 --batches 1,2 -o fdn_lolblur.fdnx

Serve it:
  from fdn_tip2025_tpu.export import load_exported
  m = load_exported("fdn_lolblur.fdnx"); out = m.restore(uint8_img)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--variant", default="lolblur",
                    choices=["lolblur", "lolv1"])
    ap.add_argument("--fdn-ckpt", default=None,
                    help=".pth or orbax dir (random weights if omitted "
                         "— smoke/testing only)")
    ap.add_argument("--lpnet-ckpt", default=None)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="serving dtype (bf16 = the validated production "
                         "mode, 43.5 dB vs f32 with trained weights)")
    ap.add_argument("--sizes", default="640x1120",
                    help="comma list of HxW padded buckets (x32 each)")
    ap.add_argument("--batches", default="1",
                    help="comma list of batch sizes per bucket")
    ap.add_argument("--wire", default="uint8",
                    choices=["uint8", "float"],
                    help="wire format to bake in (uint8 = 1 B/px both "
                         "ways, validated at the modes' noise floors)")
    ap.add_argument("--with-ratio", action="store_true",
                    help="also export explicit-ratio programs "
                         "(inference_fdn_multi_r-style sweeps)")
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. tpu,cpu for a multi-platform "
                         "artifact (default: current backend)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from fdn_tip2025_tpu.inference import FDNPredictor
    from fdn_tip2025_tpu.export import save_exported

    sizes = []
    for s in args.sizes.split(","):
        h, w = s.lower().split("x")
        sizes.append((int(h), int(w)))
    batches = [int(b) for b in args.batches.split(",")]
    buckets = [(b, h, w) for h, w in sizes for b in batches]

    pred = FDNPredictor(
        variant=args.variant, fdn_ckpt=args.fdn_ckpt,
        lpnet_ckpt=args.lpnet_ckpt,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
    if args.fdn_ckpt is None:
        print("WARNING: no --fdn-ckpt — exporting RANDOM FDN weights",
              file=sys.stderr)
    u8 = args.wire == "uint8"
    meta = save_exported(
        args.output, pred, buckets, with_ratio=args.with_ratio,
        from_uint8=u8, to_uint8=u8,
        platforms=args.platforms.split(",") if args.platforms else None)
    sz = os.path.getsize(args.output) / 1e6
    print(f"wrote {args.output} ({sz:.1f} MB): "
          f"{len(meta['buckets'])} programs, dtype {meta['dtype']}, "
          f"wire {'uint8' if u8 else 'float'}, "
          f"platforms {meta['platforms'] or 'current'}")


if __name__ == "__main__":
    main()
