#!/usr/bin/env python
"""Record the golden-fixture regression set (VERDICT-r4 #4).

Generates tests/fixtures/golden/: ~4 tiny synthetic input/GT PNG pairs,
the restored outputs of BOTH implementations (ours via the production
tools/infer_lolblur.py CLI; the PyTorch reference via the mounted
/root/reference tree) under ONE committed trained FDN checkpoint, and a
golden.json with the recorded metrics-CLI values. After this runs once,
tests/test_golden_regression.py re-drives infer -> metrics_gate on any
host WITHOUT torch or /root/reference and fails if either CLI's output
drifts from the recordings.

Why trained weights: with random weights the two implementations
diverge chaotically (1e-7 numeric differences amplified ~3e6x by the
restore tail — benchmarks/artifacts/spatial_diag_r4.json), so "the
reference's outputs" would pin nothing. With a trained checkpoint the
implementations agree to >50 dB (cross_check protocol) and one golden
set represents both.

    python tools/record_goldens.py --fdn-ckpt <trained .pth> \
        [--out tests/fixtures/golden]
"""

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

N_IMAGES = 4
SIZE_H, SIZE_W = 60, 88  # pads to 64x96 — exercises the x32 pad path


def make_inputs(out_dir, n=N_IMAGES, seed=2025):
    import cv2
    from cross_check import synth_pair

    rng = np.random.default_rng(seed)
    in_dir = os.path.join(out_dir, "in", "0001")
    gt_dir = os.path.join(out_dir, "gt", "0001")
    os.makedirs(in_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    for i in range(n):
        lq, gt = synth_pair(rng, max(SIZE_H, SIZE_W))
        lq, gt = lq[:SIZE_H, :SIZE_W], gt[:SIZE_H, :SIZE_W]
        cv2.imwrite(os.path.join(in_dir, f"{i:04d}.png"),
                    (lq[..., ::-1] * 255).round().astype(np.uint8))
        cv2.imwrite(os.path.join(gt_dir, f"{i:04d}.png"),
                    (gt[..., ::-1] * 255).round().astype(np.uint8))


def run_cli(args_list, env=None):
    e = dict(os.environ, FDN_DEVICE="cpu", **(env or {}))
    proc = subprocess.run([sys.executable] + args_list, cwd=REPO, env=e,
                          capture_output=True, text=True, timeout=1800)
    if proc.returncode != 0:
        raise SystemExit(proc.stdout + proc.stderr)
    return proc.stdout


def torch_reference_outputs(fdn_ckpt, out_dir):
    """Run the mounted PyTorch reference with the same checkpoint +
    ratios over the fixture inputs; save PNGs (reference protocol:
    inference_fdn_lolblur.py pad x32 / crop back)."""
    import cv2
    import torch
    from cross_check import reference_forward
    from fdn_tip2025_tpu.inference import FDNPredictor

    ins = sorted(glob.glob(os.path.join(out_dir, "in", "*", "*.png")))
    lq = np.stack([cv2.imread(p)[..., ::-1].astype(np.float32) / 255.0
                   for p in ins])
    pred = FDNPredictor(variant="lolblur", fdn_ckpt=fdn_ckpt,
                        lpnet_ckpt=None)  # deterministic PRNGKey(0) LPNet
    # reference protocol: reflect-pad to x32 FIRST, ratio from the
    # padded image, forward, crop back (inference_fdn_lolblur.py:60-72;
    # our CLI's internal ratio=None path does the same)
    h, w = lq.shape[1:3]
    ph, pw = (-h) % 32, (-w) % 32
    lq_pad = np.pad(lq, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    mode="reflect")
    ratio = pred.predict_ratio(lq_pad).astype(np.float32)
    ref = reference_forward(fdn_ckpt, lq_pad, ratio)[:, :h, :w]
    ref_dir = os.path.join(out_dir, "ref_out", "0001")
    os.makedirs(ref_dir, exist_ok=True)
    for p, img in zip(ins, ref):
        out8 = (np.clip(img, 0, 1) * 255).round().astype(np.uint8)
        cv2.imwrite(os.path.join(ref_dir, os.path.basename(p)),
                    out8[..., ::-1])
    return [float(r) for r in ratio.ravel()]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fdn-ckpt", required=True,
                    help="trained FDN .pth (committed alongside)")
    ap.add_argument("--out", default=os.path.join(
        REPO, "tests", "fixtures", "golden"))
    args = ap.parse_args()

    if os.path.isdir(args.out):
        shutil.rmtree(args.out)
    os.makedirs(args.out)

    print("fixture inputs ...", flush=True)
    make_inputs(args.out)

    print("our CLI outputs (tools/infer_lolblur.py, CPU) ...", flush=True)
    run_cli(["tools/infer_lolblur.py",
             "--input", os.path.join(args.out, "in", "*", "*.png"),
             "--output", os.path.join(args.out, "out"),
             "--fdn-ckpt", args.fdn_ckpt, "--lpnet-ckpt", "random"])

    print("metrics CLI (psnr+ssim vs gt) ...", flush=True)
    csv_path = os.path.join(args.out, "metrics.csv")
    run_cli(["tools/metrics_gate.py", "-m", "psnr", "ssim",
             "--img-dir", os.path.join(args.out, "out", "0001"),
             "--ref-dir", os.path.join(args.out, "gt", "0001"),
             "--csv", csv_path])
    import csv as csv_mod
    with open(csv_path) as f:
        rows = list(csv_mod.DictReader(f))
    metrics = {r["img"]: {"psnr": float(r["psnr"]),
                          "ssim": float(r["ssim"])} for r in rows}

    print("torch reference outputs (mounted tree) ...", flush=True)
    ratios = torch_reference_outputs(args.fdn_ckpt, args.out)

    # cross-implementation agreement at record time (trained weights)
    from fdn_tip2025_tpu.metrics import calculate_psnr
    import cv2
    cross = []
    for p in sorted(glob.glob(os.path.join(args.out, "out", "0001",
                                           "*.png"))):
        a = cv2.imread(p).astype(np.float64)
        b = cv2.imread(os.path.join(args.out, "ref_out", "0001",
                                    os.path.basename(p))).astype(np.float64)
        cross.append(calculate_psnr(a, b, crop_border=0))
    meta = {
        "fdn_ckpt": os.path.relpath(args.fdn_ckpt, REPO),
        "n_images": N_IMAGES, "size": [SIZE_H, SIZE_W],
        "lpnet": "deterministic random init (PRNGKey(0) split)",
        "ratios": ratios,
        "metrics": metrics,
        "cross_psnr_db_record_time": [round(float(c), 2) for c in cross],
        "note": "ours-vs-reference PSNR at record time with the trained "
                "checkpoint; the regression test compares fresh CLI "
                "outputs against out/ (ours) and golden metric values, "
                "torch-free",
    }
    with open(os.path.join(args.out, "golden.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta, indent=1))


if __name__ == "__main__":
    main()
