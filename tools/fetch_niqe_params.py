#!/usr/bin/env python
"""Install + validate the NIQE pristine-model parameters (DATA, not code).

NIQE needs `niqe_pris_params.npz` (pristine-image MVG mu/cov + Gaussian
window), shipped by the reference at basicsr/metrics/niqe_pris_params.npz
and by any BasicSR checkout. This repo deliberately does not bundle it
(no copied artifacts); on a host without the /root/reference mount, run:

    python tools/fetch_niqe_params.py --from /path/to/FDN-or-BasicSR \
        --to ~/.cache/fdn/niqe_pris_params.npz
    export NIQE_PRIS_PARAMS=~/.cache/fdn/niqe_pris_params.npz

`--from` may be a checkout root (the basicsr/metrics/ path is appended)
or the .npz file itself. The copy is validated for the three expected
arrays and their shapes before installation.
"""

import argparse
import os
import shutil
import sys

import numpy as np

EXPECTED = {
    "mu_pris_param": (1, 36),
    "cov_pris_param": (36, 36),
    "gaussian_window": (7, 7),
}


def locate(src):
    if os.path.isfile(src):
        return src
    for rel in ("basicsr/metrics/niqe_pris_params.npz",
                "niqe_pris_params.npz"):
        cand = os.path.join(src, rel)
        if os.path.isfile(cand):
            return cand
    raise SystemExit(
        f"no niqe_pris_params.npz under {src!r} — pass a reference/BasicSR "
        "checkout root or the .npz file itself")


def validate(path):
    z = np.load(path)
    for name, shape in EXPECTED.items():
        if name not in z:
            raise SystemExit(f"{path}: missing array {name!r} "
                             f"(has {sorted(z.files)})")
        if tuple(z[name].shape) != shape:
            raise SystemExit(f"{path}: {name} has shape {z[name].shape}, "
                             f"expected {shape}")
        if not np.isfinite(z[name]).all():
            raise SystemExit(f"{path}: {name} contains non-finite values")
    return {k: tuple(z[k].shape) for k in EXPECTED}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--from", dest="src", default="/root/reference",
                    help="reference/BasicSR checkout root, or the .npz "
                         "file (default: the /root/reference mount)")
    ap.add_argument("--to", dest="dst", required=True,
                    help="destination path for the validated .npz")
    args = ap.parse_args(argv)

    src = locate(args.src)
    shapes = validate(src)
    os.makedirs(os.path.dirname(os.path.abspath(args.dst)), exist_ok=True)
    shutil.copyfile(src, args.dst)
    validate(args.dst)
    print(f"installed {src} -> {args.dst} ({shapes})")
    print(f"export NIQE_PRIS_PARAMS={args.dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
