#!/usr/bin/env python
"""FDN serving daemon — batching HTTP inference server.

  python tools/serve.py --fdn-ckpt FDN_lolblur.pth \
      --lpnet-ckpt LPNet_lolblur.pth --dtype bfloat16 --port 8700

  curl -X POST --data-binary @dark.png \
      'http://localhost:8700/restore' -o restored.png
  curl -X POST --data-binary @dark.png \
      'http://localhost:8700/restore?ratio=0.55' -o restored.png
  curl http://localhost:8700/healthz

Serving modes: --dtype bfloat16 is the validated production mode
(43.5 dB vs f32 with trained weights); --mesh N shards batches over the
first N devices (data parallel). Requests are micro-batched per padded
x32 bucket (--max-batch / --window-ms).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="lolblur",
                    choices=["lolblur", "lolv1"])
    ap.add_argument("--fdn-ckpt", default=None)
    ap.add_argument("--lpnet-ckpt", default=None)
    ap.add_argument("--artifact", default=None,
                    help="serve a .fdnx AOT artifact (tools/"
                         "export_model.py) instead of loading "
                         "checkpoints: fixed buckets, no model re-trace; "
                         "export batches up to --max-batch and a uint8 "
                         "wire. Overrides --fdn-ckpt/--lpnet-ckpt/"
                         "--dtype; tiling and --mesh are unavailable")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard batches over the first N devices (0 = "
                         "single device)")
    ap.add_argument("--spatial", action="store_true",
                    help="with --mesh N: shard each image's ROWS over "
                         "the mesh instead of the batch dim (sequence-"
                         "parallel analog) — lowers per-request latency "
                         "rather than adding batch throughput; forces "
                         "--max-batch 1")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8700)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--window-ms", type=float, default=5.0)
    ap.add_argument("--tile-above-mp", type=float, default=2.5,
                    help="requests over this many megapixels run the "
                         "grids-protocol tiled restore instead of a "
                         "dedicated jit bucket (0 disables)")
    ap.add_argument("--tile-crop", type=int, default=384)
    ap.add_argument("--warmup-hw", default=None,
                    help="H,W to compile at startup (e.g. 640,1120) so "
                         "the first request doesn't pay the jit")
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from fdn_tip2025_tpu.inference import FDNPredictor
    from fdn_tip2025_tpu.parallel.mesh import make_mesh
    from fdn_tip2025_tpu.serving import MicroBatcher, make_http_server

    if args.artifact:
        from fdn_tip2025_tpu.export import load_exported
        if args.mesh or args.spatial:
            ap.error("--artifact serves single-device programs "
                     "(no --mesh/--spatial)")
        pred = load_exported(args.artifact)
        if not pred._from_uint8 or not pred._to_uint8:
            ap.error("the serving daemon needs a uint8-wire artifact "
                     "(tools/export_model.py --wire uint8)")
        args.tile_above_mp = 0  # tiled restore needs the live model code
        # the micro-batcher pads groups to power-of-two batches: clamp
        # --max-batch to the largest pow2 chain every exported (h, w)
        # bucket actually provides
        sizes = {(h, w) for _, h, w, wr in pred.buckets() if not wr}
        mb = 1
        while mb * 2 <= args.max_batch and all(
                (mb * 2, h, w, False) in pred._exp for h, w in sizes):
            mb *= 2
        if mb != args.max_batch:
            print(f"--max-batch clamped to {mb}: the artifact exports "
                  f"batches {sorted({b for b, _, _, wr in pred.buckets() if not wr})}",
                  flush=True)
            args.max_batch = mb
        for batch, h, w, with_ratio in pred.buckets():
            x = np.zeros((batch, h, w, 3), np.uint8)
            if with_ratio:
                pred.restore(x, ratio=np.full((batch,), 0.5, np.float32))
            else:
                pred.restore(x)
            print(f"warmed artifact bucket {h}x{w} batch {batch} "
                  f"ratio={'explicit' if with_ratio else 'lpnet'}",
                  flush=True)
    else:
        if args.fdn_ckpt is None:
            print("WARNING: no --fdn-ckpt — serving RANDOM FDN weights "
                  "(smoke mode only)", flush=True)
        if args.spatial and not args.mesh:
            ap.error("--spatial requires --mesh N")
        if args.spatial:
            # all devices work on one image; batching would serialize
            args.max_batch = 1
        pred = FDNPredictor(
            variant=args.variant, fdn_ckpt=args.fdn_ckpt,
            lpnet_ckpt=args.lpnet_ckpt,
            dtype=jnp.dtype(args.dtype),
            mesh=make_mesh(args.mesh) if args.mesh else None,
            spatial=args.spatial)
    if args.warmup_hw and not args.artifact:
        # compile every power-of-two batch size the micro-batcher can
        # form at this bucket — BOTH ratio modes (?ratio= requests hit a
        # separate jit program) — so no client request ever pays a jit
        h, w = (int(v) for v in args.warmup_hw.split(","))
        b = 1
        while True:
            x = np.zeros((b, h, w, 3), np.uint8)
            pred.restore(x, output="uint8")
            pred.restore(x, ratio=np.full((b,), 0.5, np.float32),
                         output="uint8")
            print(f"warmed up at {h}x{w} batch {b} (both ratio modes)",
                  flush=True)
            if b >= args.max_batch:
                break
            b = min(b * 2, args.max_batch)

    # uint8 in/out on the wire: decode bytes ship as-is, quantization to
    # PNG-ready uint8 runs on-device (4x fewer transfer bytes than f32)
    batcher = MicroBatcher(
        pred, max_batch=args.max_batch, window_ms=args.window_ms,
        output="uint8",
        tile_above_px=int(args.tile_above_mp * 1e6) or None,
        tile_crop=args.tile_crop)
    srv = make_http_server(batcher, args.host, args.port)
    print(f"serving on {args.host}:{args.port} "
          f"(dtype={np.dtype(pred.dtype).name}, mesh={args.mesh or 1}"
          f"{', artifact' if args.artifact else ''})", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.close()


if __name__ == "__main__":
    main()
