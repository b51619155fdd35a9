#!/usr/bin/env python
"""Full-reference metric harness — equivalent of the reference's m.py
(:57-125, the external fidelity gate): per-image PSNR/SSIM(/LPIPS) over a
result dir vs a GT dir, mean + CSV dump.

Usage:
  python tools/metrics_gate.py -m psnr ssim \
      --img-dir results/FDN_lolblur --ref-dir data/test/high_sharp_scaled \
      --csv four_lolblur.csv
LPIPS requires a weights path (torchvision VGG + lpips linear heads are not
bundled); psnr/ssim/niqe run out of the box.
"""

import argparse
import csv
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()  # FDN_DEVICE=cpu to force CPU (sitecustomize pins TPU)

from fdn_tip2025_tpu.metrics import (  # noqa: E402
    calculate_psnr, calculate_ssim,
)
from fdn_tip2025_tpu.utils.img_io import imread  # noqa: E402


def list_images(d):
    exts = ("*.png", "*.jpg", "*.jpeg", "*.bmp")
    out = []
    for e in exts:
        out += glob.glob(os.path.join(d, "**", e), recursive=True)
    return sorted(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--metrics", nargs="+",
                    default=["psnr", "ssim"],
                    help="psnr ssim niqe lpips, or any name a --plugin "
                         "module registers (the m.py:72 arbitrary-pyiqa-"
                         "metric analog)")
    ap.add_argument("--plugin", action="append", default=[],
                    help="importable module that calls fdn_tip2025_tpu."
                         "metrics.register_metric(name, fn) at import; "
                         "repeatable. fn(img, ref)->float, RGB [0,1] HWC")
    ap.add_argument("--img-dir", required=True)
    ap.add_argument("--ref-dir", required=True)
    ap.add_argument("--csv", default="./metrics.csv")
    ap.add_argument("--lpips-vgg", default=None,
                    help="torchvision vgg16 .pth (required for -m lpips)")
    ap.add_argument("--lpips-lin", default=None,
                    help="lpips linear-head .pth (required for -m lpips)")
    args = ap.parse_args()

    import importlib

    from fdn_tip2025_tpu.metrics import available_metrics

    for mod in args.plugin:
        importlib.import_module(mod)
    plug = available_metrics()
    builtin = {"psnr", "ssim", "niqe", "lpips"}
    for m in args.metrics:
        if m not in builtin and m not in plug:
            raise SystemExit(
                f"unknown metric {m!r}: built-ins are {sorted(builtin)}; "
                f"registered plugins: "
                f"{sorted(set(plug) - builtin) or 'none'} "
                "(load one with --plugin <module>)")

    lpips_fn = None
    if "lpips" in args.metrics:
        if not (args.lpips_vgg and args.lpips_lin):
            raise SystemExit(
                "-m lpips needs --lpips-vgg <vgg16.pth> and --lpips-lin "
                "<lpips lin .pth> (no pretrained weights are bundled)")
        import jax
        import jax.numpy as jnp
        from fdn_tip2025_tpu.metrics.lpips import load_lpips_params, lpips
        lp_params = load_lpips_params(args.lpips_vgg, args.lpips_lin)
        jl = jax.jit(lambda x, y: lpips(lp_params, x, y, normalize=True))

        def lpips_fn(a, b):
            # imread returns RGB float [0,1] — LPIPS consumes RGB directly
            return float(jl(jnp.asarray(a)[None], jnp.asarray(b)[None])[0])

    imgs = list_images(args.img_dir)
    refs = list_images(args.ref_dir)
    if len(imgs) != len(refs):
        raise SystemExit(
            f"count mismatch: {len(imgs)} results vs {len(refs)} refs")

    rows = []
    sums = {m: 0.0 for m in args.metrics}
    for ip, rp in zip(imgs, refs):
        a = imread(ip)
        b = imread(rp)
        row = {"img": os.path.basename(ip)}
        for m in args.metrics:
            if m == "psnr":
                v = calculate_psnr(a, b, crop_border=0)
            elif m == "ssim":
                v = calculate_ssim(a, b, crop_border=0, ssim3d=True)
            elif m == "niqe":
                from fdn_tip2025_tpu.metrics.niqe import calculate_niqe
                try:
                    v = calculate_niqe((a[..., ::-1] * 255), crop_border=0)
                except FileNotFoundError as e:
                    # missing pristine-model npz (data, user-suppliable):
                    # exit with the acquisition hint, not a traceback
                    raise SystemExit(f"niqe: {e}")
            elif m == "lpips":
                v = lpips_fn(a, b)
            else:
                v = plug[m](a, b)
            row[m] = float(v)
            sums[m] += float(v)
        rows.append(row)

    n = len(rows)
    print({m: sums[m] / n for m in args.metrics})
    with open(args.csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["img"] + args.metrics)
        w.writeheader()
        w.writerows(rows)
        w.writerow({"img": "MEAN",
                    **{m: sums[m] / n for m in args.metrics}})


if __name__ == "__main__":
    main()
