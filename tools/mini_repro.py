#!/usr/bin/env python
"""Mini end-to-end reproduction of the reference's full 3-stage recipe,
driven through the PRODUCTION CLIs on synthetic data:

  1. MAR pretraining        (MAR.sh ≙ configs/mar_train.yml recipe)
  2. FDN with frozen trained MAR (fdn.sh; path.pretrain_mar)
  3. LPNet ratio regression (train_lpnet.sh), validated by restoring
     through the frozen stage-2 FDN (path.pretrain_network_fft)
  4. offline eval (tools/test.py ≙ basicsr/test.py), inference CLI +
     metric gate (inference_fdn_lolblur.py + m.py protocol)

Each stage runs `tools/train.py -opt <generated yml>` as a subprocess —
the same commands a user runs, exercising configs, checkpoints,
auto-resume layout, validation, and the stage hand-offs. Writes a JSON
summary (use --out). Runs on the live backend (TPU; FDN_DEVICE=cpu for
CPU smoke at reduced iters).

Reference recipe being mirrored (SURVEY.md §6): MAR 1-GPU batch 4
crop 256 @ lr 1e-4; FDN 4-GPU batch 4 crop 128 @ lr 1e-3 (L1 + 0.1 FFT
[+ 0.01 VGG when weights supplied]); LPNet batch 4 crop 512 @ lr 1e-3
ratio-L1 — at mini scale (crop 96/96/192, hundreds of iters).
"""

import argparse
import json
import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_dataset(root, n_train=48, n_val=4, size=192, seed=0):
    import cv2

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from cross_check import synth_pair

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("test", n_val)):
        lq_dir = os.path.join(root, split, "low_blur", "0001")
        gt_dir = os.path.join(root, split, "high_sharp", "0001")
        os.makedirs(lq_dir, exist_ok=True)
        os.makedirs(gt_dir, exist_ok=True)
        for i in range(n):
            lq, gt = synth_pair(rng, size)
            cv2.imwrite(os.path.join(lq_dir, f"{i:04d}.png"),
                        (lq[..., ::-1] * 255).round().astype(np.uint8))
            cv2.imwrite(os.path.join(gt_dir, f"{i:04d}.png"),
                        (gt[..., ::-1] * 255).round().astype(np.uint8))


def write_cfg(path, name, model_type, root, iters, lr, crop, batch=4,
              val_freq=None, extra_path=None, extra_train=None):
    val_freq = val_freq or iters
    lines = [
        f"name: {name}",
        f"model_type: {model_type}",
        "scale: 1",
        "num_gpu: 1",
        "manual_seed: 42",
        "use_ratio: true",
        "",
        "datasets:",
        "  train:",
        "    name: mini-train",
        "    type: PairedImageDataset",
        f"    dataroot_gt: {root}/train/high_sharp/*/*",
        f"    dataroot_lq: {root}/train/low_blur/*/*",
        f"    gt_size: {crop}",
        "    use_flip: true",
        "    use_rot: true",
        "    num_worker_per_gpu: 2",
        f"    batch_size_per_gpu: {batch}",
        "  val:",
        "    name: mini-val",
        "    type: PairedImageDataset",
        f"    dataroot_gt: {root}/test/high_sharp/*/*",
        f"    dataroot_lq: {root}/test/low_blur/*/*",
        "",
        "path:",
        "  strict_load_g: true",
    ] + (extra_path or []) + [
        "",
        "train:",
        "  optim_g:",
        "    type: AdamW",
        f"    lr: !!float {lr}",
        "    weight_decay: 0.0",
        "    betas: [0.9, 0.9]",
        "  scheduler:",
        "    type: TrueCosineAnnealingLR",
        f"    T_max: {iters}",
        "    eta_min: !!float 1e-7",
        f"  total_iter: {iters}",
        "  warmup_iter: -1",
        "  use_grad_clip: true",
    ] + (extra_train or []) + [
        "",
        "val:",
        f"  val_freq: {val_freq}",
        "  max_images: 4",
        "  metrics:",
        "    psnr:",
        "      type: calculate_psnr",
        "      crop_border: 0",
        "      test_y_channel: false",
        "",
        "logger:",
        "  print_freq: 50",
        f"  save_checkpoint_freq: {iters}",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def run_stage(cfg, log_path, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    with open(log_path, "w") as f:
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "tools", "train.py"),
             "-opt", cfg], stdout=f, stderr=subprocess.STDOUT, cwd=REPO,
            env=e)
    out = open(log_path).read()
    if rc != 0:
        raise SystemExit(f"stage {cfg} failed (rc {rc}); log: {log_path}\n"
                         + out[-3000:])
    return out


def last_metric(log, name="psnr"):
    vals = re.findall(rf"{name}: ([0-9.]+)", log)
    return float(vals[-1]) if vals else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/fdn_mini")
    ap.add_argument("--mar-iters", type=int, default=300)
    ap.add_argument("--fdn-iters", type=int, default=600)
    ap.add_argument("--lpnet-iters", type=int, default=300)
    ap.add_argument("--out", default="/tmp/fdn_mini/summary.json")
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    # tools/train.py expands experiment dirs under CWD (options.parse)
    exp = os.path.join(REPO, "experiments")
    print("generating synthetic dataset ...", flush=True)
    make_dataset(args.root)

    summary = {}
    env = {}

    # stage 1: MAR
    cfg = os.path.join(args.root, "mar.yml")
    write_cfg(cfg, "mini_MAR", "ImageRestorationModel_ipretrain",
              args.root, args.mar_iters, 1e-4, crop=96,
              val_freq=args.mar_iters // 2)
    print(f"stage 1/3: MAR {args.mar_iters} iters ...", flush=True)
    log = run_stage(cfg, os.path.join(args.root, "mar.log"), env)
    summary["mar_val_psnr"] = last_metric(log)
    mar_ckpt = os.path.join(exp, "mini_MAR", "models",
                            f"net_g_{args.mar_iters}")

    # stage 2: FDN with frozen trained MAR
    cfg = os.path.join(args.root, "fdn.yml")
    write_cfg(cfg, "mini_FDN", "ImageRestorationModel", args.root,
              args.fdn_iters, 1e-3, crop=96,
              val_freq=args.fdn_iters // 2,
              extra_path=[f"  pretrain_mar: {mar_ckpt}"],
              extra_train=[
                  "  pixel_opt: {type: L1Loss, loss_weight: 1.0, "
                  "reduction: mean}",
                  "  fft_loss_opt: {type: FFTLoss, loss_weight: 0.1, "
                  "reduction: mean}"])
    print(f"stage 2/3: FDN {args.fdn_iters} iters ...", flush=True)
    log = run_stage(cfg, os.path.join(args.root, "fdn.log"), env)
    summary["fdn_val_psnr"] = last_metric(log)
    fdn_ckpt = os.path.join(exp, "mini_FDN", "models",
                            f"net_g_{args.fdn_iters}")

    # stage 3: LPNet, validated through the frozen stage-2 FDN
    cfg = os.path.join(args.root, "lpnet.yml")
    write_cfg(cfg, "mini_LPNet", "ImageRestorationModel_ipred",
              args.root, args.lpnet_iters, 1e-3, crop=192,
              val_freq=args.lpnet_iters // 2,
              extra_path=[f"  pretrain_network_fft: {fdn_ckpt}"])
    print(f"stage 3/3: LPNet {args.lpnet_iters} iters ...", flush=True)
    log = run_stage(cfg, os.path.join(args.root, "lpnet.log"), env)
    summary["lpnet_val_psnr"] = last_metric(log)

    # offline eval (basicsr/test.py equivalent) on the FDN checkpoint
    print("offline eval (tools/test.py) ...", flush=True)
    test_log = os.path.join(args.root, "test.log")
    with open(test_log, "w") as f:
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "tools", "test.py"),
             "-opt", os.path.join(args.root, "fdn.yml"),
             "--ckpt", fdn_ckpt, "--max-images", "4"],
            stdout=f, stderr=subprocess.STDOUT, cwd=REPO,
            env={**os.environ, **env})
    tlog = open(test_log).read()
    if rc != 0:
        raise SystemExit(f"offline eval failed:\n{tlog[-2000:]}")
    summary["offline_eval_psnr"] = last_metric(tlog)

    summary["iters"] = {"mar": args.mar_iters, "fdn": args.fdn_iters,
                        "lpnet": args.lpnet_iters}
    print(json.dumps(summary))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
