#!/usr/bin/env python
"""Recipe-shaped training evidence run (VERDICT-r4 #3).

An honest scale-down of the reference FDN recipe
(options/train/FDN.yml:19-27 — 500k iters, 128^2 crops, global batch 16,
frozen pretrained MAR, L1 + 0.1*FFT + 0.01*VGG, cosine lr) driven through
the PRODUCTION CLIs on synthetic data, with the long-horizon mechanics
the smoke tests never exercise:

  1. MAR pretraining (frozen-MAR input to stage 2)
  2. FDN: thousands of iters at 128^2 crops, batch 16, AMP
     (train.mixed_precision), 3-term objective (random-init VGG19 — real
     weights are env-blocked, the gradient path is weight-agnostic),
     in-training validation every --val-freq iters
  3. ONE mid-run SIGTERM preemption -> relaunch -> auto-resume (the
     train_ir.py:174-197 + preemption-checkpoint path at depth)
  4. final export -> torch-reference cross-check (strict=True load,
     identical inputs/ratios; PSNR between the two implementations)

Writes one JSON artifact: loss curve, per-validation PSNR series, the
loss window around the resume seam, and the cross-implementation PSNR.
Done-bars (VERDICT): monotone-ish val curve, seam invisible in the loss
series, cross-PSNR >= 54 dB.

    python tools/recipe_run.py --fdn-iters 5000 --out \
        benchmarks/artifacts/recipe_r5.json
"""

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from mini_repro import make_dataset, write_cfg, run_stage  # noqa: E402


def save_random_vgg19(path, seed=0):
    """Random weights in the exact torchvision vgg19 layout (the load
    path tests/test_weights_path.py proves; blobs are env-blocked)."""
    import torch
    from tests.torch_ref import make_random_vgg
    torch.manual_seed(seed)
    torch.save(make_random_vgg("vgg19").state_dict(), path)


def parse_losses(log):
    """(iter, l_total) series from MessageLogger lines."""
    out = []
    for m in re.finditer(r"iter:\s*([0-9,]+),.*?l_total: ([0-9.e+-]+)",
                         log):
        out.append((int(m.group(1).replace(",", "")), float(m.group(2))))
    return out


def parse_vals(log, phase="val"):
    out = []
    for m in re.finditer(
            rf"validation\[{phase}\] @ (\d+): .*?psnr: ([0-9.]+)", log):
        out.append((int(m.group(1)), float(m.group(2))))
    return out


def launch(cfg, log_path, extra_args=()):
    f = open(log_path, "a")
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "-opt", cfg, *extra_args], stdout=f, stderr=subprocess.STDOUT,
        cwd=REPO, env=dict(os.environ)), f


def wait_for_iter(log_path, target, timeout_s, poll=20):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        time.sleep(poll)
        losses = parse_losses(open(log_path).read())
        if losses and losses[-1][0] >= target:
            return losses[-1][0]
    raise SystemExit(f"timed out waiting for iter {target} in {log_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/fdn_recipe")
    ap.add_argument("--name", default="recipe_FDN")
    ap.add_argument("--mar-iters", type=int, default=800)
    ap.add_argument("--fdn-iters", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--val-freq", type=int, default=500)
    ap.add_argument("--interrupt-at", type=int, default=0,
                    help="SIGTERM the FDN stage once it passes this iter "
                         "(0 = fdn_iters * 0.4)")
    ap.add_argument("--stage-timeout", type=int, default=4 * 3600)
    ap.add_argument("--out", default="benchmarks/artifacts/recipe_r5.json")
    ap.add_argument("--eval-size", type=int, default=192)
    ap.add_argument("--skip-mar", action="store_true",
                    help="reuse an existing MAR checkpoint from a prior "
                         "run (same --root)")
    args = ap.parse_args()
    interrupt_at = args.interrupt_at or int(args.fdn_iters * 0.4)
    exp = os.path.join(REPO, "experiments")

    os.makedirs(args.root, exist_ok=True)
    summary = {"recipe": {
        "fdn_iters": args.fdn_iters, "crop": args.crop,
        "global_batch": args.batch, "amp": True, "objective":
        "L1 + 0.1*FFT + 0.01*VGG(random)", "mar_iters": args.mar_iters,
        "reference": "options/train/FDN.yml:19-27 scaled down"}}
    t_all = time.time()

    print("dataset ...", flush=True)
    make_dataset(args.root, n_train=64, n_val=4, size=192)
    vgg_pth = os.path.join(args.root, "vgg19_random.pth")
    if not os.path.exists(vgg_pth):
        save_random_vgg19(vgg_pth)

    # ---- stage 1: MAR pretraining -------------------------------------
    mar_ckpt = os.path.join(exp, "recipe_MAR", "models",
                            f"net_g_{args.mar_iters}")
    if not (args.skip_mar and os.path.isdir(mar_ckpt)):
        cfg = os.path.join(args.root, "mar.yml")
        # MARLoss carries a 10x VGG term (reference losses.py:764-774) —
        # the random-init VGG keeps the MAR recipe 3-term-shaped too
        write_cfg(cfg, "recipe_MAR", "ImageRestorationModel_ipretrain",
                  args.root, args.mar_iters, 1e-4, crop=args.crop,
                  batch=8, val_freq=args.mar_iters,
                  extra_path=[f"  vgg_weights: {vgg_pth}"])
        print(f"stage 1: MAR {args.mar_iters} iters ...", flush=True)
        t0 = time.time()
        log = run_stage(cfg, os.path.join(args.root, "mar.log"))
        summary["mar_wall_s"] = round(time.time() - t0)
        summary["mar_val_psnr"] = (parse_vals(log) or [(0, None)])[-1][1]

    # ---- stage 2: FDN, recipe-shaped, with one preemption -------------
    cfg = os.path.join(args.root, "fdn.yml")
    write_cfg(
        cfg, args.name, "ImageRestorationModel", args.root,
        args.fdn_iters, 1e-3, crop=args.crop, batch=args.batch,
        val_freq=args.val_freq,
        extra_path=[f"  pretrain_mar: {mar_ckpt}",
                    f"  vgg_weights: {vgg_pth}"],
        extra_train=[
            "  mixed_precision: true",
            "  pixel_opt: {type: L1Loss, loss_weight: 1.0, "
            "reduction: mean}",
            "  fft_loss_opt: {type: FFTLoss, loss_weight: 0.1, "
            "reduction: mean}",
        ])
    log_path = os.path.join(args.root, "fdn.log")
    open(log_path, "w").close()

    print(f"stage 2: FDN {args.fdn_iters} iters @ {args.crop}^2 "
          f"batch {args.batch} AMP; SIGTERM at ~{interrupt_at} ...",
          flush=True)
    t0 = time.time()
    proc, f = launch(cfg, log_path)
    reached = wait_for_iter(log_path, interrupt_at,
                            args.stage_timeout)
    print(f"  iter {reached}: sending SIGTERM ...", flush=True)
    proc.send_signal(signal.SIGTERM)
    rc = proc.wait(timeout=900)
    f.close()
    log1 = open(log_path).read()
    assert rc == 0, f"preempted run exited rc={rc}"
    assert "preemption checkpoint" in log1, "no preemption checkpoint line"
    seam_iter = parse_losses(log1)[-1][0]
    summary["preempt"] = {"signal_at": reached, "checkpoint_at": seam_iter}

    print(f"  relaunching (auto-resume from {seam_iter}) ...", flush=True)
    proc, f = launch(cfg, log_path)
    rc = proc.wait(timeout=args.stage_timeout)
    f.close()
    assert rc == 0, f"resumed run exited rc={rc}"
    log2 = open(log_path).read()
    assert "resumed from" in log2, "no auto-resume line after relaunch"
    summary["fdn_wall_s"] = round(time.time() - t0)

    losses = parse_losses(log2)
    vals = parse_vals(log2)
    summary["loss_first"] = losses[0][1]
    summary["loss_last"] = losses[-1][1]
    summary["loss_curve"] = losses[:: max(1, len(losses) // 40)]
    summary["val_psnr_series"] = vals
    # the seam window: the loss series straddling the resume point
    seam = [lv for lv in losses
            if abs(lv[0] - seam_iter) <= 5 * 50]  # 5 print periods
    summary["seam_window"] = seam

    # ---- stage 3: export + torch cross-check --------------------------
    print("export + torch cross-check ...", flush=True)
    fdn_ckpt = os.path.join(exp, args.name, "models",
                            f"net_g_{args.fdn_iters}")
    summary["cross_check"] = cross_check(fdn_ckpt, args)

    summary["wall_s"] = round(time.time() - t_all)
    print(json.dumps(summary, default=float), flush=True)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as fo:
        json.dump(summary, fo, indent=1, default=float)


def cross_check(fdn_ckpt, args):
    """Export the trained params to .pth, run the torch reference with
    them (strict=True), compare restored outputs on held-out synthetic
    pairs at identical ratios (tools/cross_check.py protocol)."""
    import numpy as np
    from fdn_tip2025_tpu.utils.platform import force_platform
    force_platform()
    import jax
    from fdn_tip2025_tpu.models import init_fdn
    from fdn_tip2025_tpu.checkpoint.manager import (
        load_network, export_torch_pth,
    )
    from fdn_tip2025_tpu.metrics import calculate_psnr
    from fdn_tip2025_tpu.inference import FDNPredictor
    from cross_check import synth_pair, reference_forward

    params = load_network(fdn_ckpt)
    pth = os.path.join(args.root, "recipe_fdn_export.pth")
    export_torch_pth(params, pth)

    rng = np.random.default_rng(123)
    pairs = [synth_pair(rng, args.eval_size) for _ in range(2)]
    lq = np.stack([p[0] for p in pairs])
    gt = np.stack([p[1] for p in pairs])
    pred = FDNPredictor(variant="lolblur", fdn_ckpt=pth)
    ratio = pred.predict_ratio(lq).astype(np.float32)
    ours = pred.restore(lq, ratio=ratio)
    ref = reference_forward(pth, lq, ratio)

    o8 = np.clip(ours, 0, 1) * 255.0
    r8 = np.clip(ref, 0, 1) * 255.0
    g8 = gt * 255.0
    mp = lambda a, b: float(np.mean(  # noqa: E731
        [calculate_psnr(x, y, crop_border=0) for x, y in zip(a, b)]))
    return {"pth": pth,
            "cross_psnr_db": round(mp(o8, r8), 2),
            "ours_vs_gt_db": round(mp(o8, g8), 2),
            "ref_vs_gt_db": round(mp(r8, g8), 2)}


if __name__ == "__main__":
    main()
