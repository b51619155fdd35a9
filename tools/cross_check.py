#!/usr/bin/env python
"""Trained-weights cross-implementation end-to-end gate (VERDICT r1 #2).

Retires the "random weights are chaotic so full-model comparison is
meaningless" caveat with data: smoke-train FDN here, export the weights
to .pth, load them into the PyTorch REFERENCE (torch CPU, strict=True),
run both implementations on identical held-out inputs, and report the
PSNR between the two restored outputs plus the LPNet ratio agreement.

Reference protocol being mirrored: inference_fdn_lolblur.py:39-75 (pad
x32, ratio straight from I_predict_net) and the m.py PSNR gate
(m.py:57-99), at reduced resolution (full-res torch-CPU takes >9 min).

Usage:
    python tools/cross_check.py                 # TPU train, ~5 min
    FDN_DEVICE=cpu python tools/cross_check.py --iters 60 --train-size 32

Prints one JSON line with cross_psnr_db / ratio_maxdiff / chaos context.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()  # honors FDN_DEVICE; enables the persistent compile cache

LPNET_CKPT = "/root/reference/checkpoint/LPNet_lolblur.pth"


def synth_pair(rng, size, blur=True):
    """One synthetic dark/blurred -> bright pair, NHWC float32 [0,1].

    Smooth scene from upsampled noise; lq = gamma-darkened (+ box blur
    + sensor noise) — the LOL-Blur degradation class, content-free.
    """
    import cv2

    coarse = rng.random((size // 8 + 2, size // 8 + 2, 3)).astype(
        np.float32)
    smooth = cv2.resize(coarse, (size, size), interpolation=cv2.INTER_CUBIC)
    gt = np.clip(0.05 + 0.9 * smooth, 0.0, 1.0).astype(np.float32)
    lq = 0.3 * gt ** 2.2
    if blur:
        k = np.ones((3, 3), np.float32) / 9.0
        pad = np.pad(lq, ((1, 1), (1, 1), (0, 0)), mode="edge")
        lq = sum(pad[dy:dy + size, dx:dx + size] * k[dy, dx]
                 for dy in range(3) for dx in range(3))
    lq = np.clip(lq + rng.normal(0, 0.01, lq.shape), 0, 1).astype(
        np.float32)
    return lq, gt


def train_fdn(iters, size, batch, lr=1e-3, seed=0, log_every=50,
              vgg="off"):
    from fdn_tip2025_tpu.parallel.mesh import make_mesh
    from fdn_tip2025_tpu.train.engine import create_trainer

    rng = np.random.default_rng(seed)
    pairs = [synth_pair(rng, size) for _ in range(16)]
    opt = {
        "name": "cross_check", "model_type": "ImageRestorationModel",
        "scale": 1, "manual_seed": seed, "use_ratio": True,
        "train": {
            "optim_g": {"type": "AdamW", "lr": lr, "weight_decay": 0.0,
                        "betas": [0.9, 0.9]},
            "scheduler": {"type": "TrueCosineAnnealingLR", "T_max": iters,
                          "eta_min": 1e-7},
            "total_iter": iters, "warmup_iter": -1,
        },
    }
    vgg_params = None
    if vgg == "random":
        # VERDICT-r2 #2: exercise the FULL reference objective
        # (L1 + 0.1*FFT + 0.01*VGG, image_restoration_model.py:477-491)
        # on-chip — pretrained VGG19 blobs are env-blocked, but the
        # perceptual GRADIENT path is weight-agnostic; random weights in
        # the exact torchvision layout prove the 3-term objective trains
        # stably end to end.
        import jax
        from fdn_tip2025_tpu.train.perceptual import init_vgg19_params
        vgg_params = init_vgg19_params(jax.random.PRNGKey(seed))
    elif vgg and vgg != "off":
        from fdn_tip2025_tpu.train.perceptual import load_vgg19_params
        vgg_params = load_vgg19_params(vgg)
    tr = create_trainer(opt, mesh=make_mesh(1), vgg_params=vgg_params)
    losses = []
    for i in range(iters):
        take = rng.integers(0, len(pairs), batch)
        b = {"lq": np.stack([pairs[j][0] for j in take]),
             "gt": np.stack([pairs[j][1] for j in take])}
        aux = tr.train_step(b)
        losses.append(float(aux["l_total"]))
        if log_every and (i + 1) % log_every == 0:
            per = (f" l_per {float(aux['l_per']):.4f}"
                   if "l_per" in aux else "")
            print(f"  iter {i + 1}/{iters} l_total {losses[-1]:.4f}{per}",
                  flush=True)
    return tr, losses


def reference_forward(pth_path, lq_batch, ratio):
    """Run the PyTorch reference FDN (torch CPU) with our exported
    weights (strict=True) on NHWC inputs; returns NHWC restored."""
    import torch
    from tests.torch_ref import import_ref_arch, to_nchw, to_nhwc

    ARCH = import_ref_arch("FDN_arch")
    state = torch.load(pth_path, map_location="cpu", weights_only=True)
    # FDN.__init__ hardcodes torch.load of MAR weights
    # (FDN_arch.py:860-862); feed it the net_a weights from our export,
    # then load the full state dict strict=True.
    mar_sd = {k[len("net_a."):]: v for k, v in state["params"].items()
              if k.startswith("net_a.")}
    orig_load = torch.load
    torch.load = lambda *a, **k: {"params": mar_sd}
    try:
        m = ARCH.FDN().eval()
    finally:
        torch.load = orig_load
    missing, unexpected = m.load_state_dict(state["params"], strict=True)
    assert not missing and not unexpected
    with torch.no_grad():
        out = m(to_nchw(lq_batch), ratio_i=torch.from_numpy(ratio))[0]
    return to_nhwc(out)


def reference_lpnet_ratio(lq_batch):
    import torch
    from tests.torch_ref import import_ref_arch, to_nchw

    LP = import_ref_arch("LPNet_arch")
    net = LP.I_predict_net().eval()
    state = torch.load(LPNET_CKPT, map_location="cpu", weights_only=True)
    net.load_state_dict(state["params"], strict=True)
    with torch.no_grad():
        r = net(to_nchw(lq_batch))
    return r.numpy().reshape(-1, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--train-size", type=int, default=64)
    ap.add_argument("--eval-size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="/tmp/fdn_cross_check")
    ap.add_argument("--bf16-size", type=int, default=0, metavar="H",
                    help="also validate bf16 serving vs f32 with the "
                         "trained weights at HxH*1.75 (VERDICT r1 #3); "
                         "0 disables. 640 = LOL-Blur eval height.")
    ap.add_argument("--skip-torch", action="store_true",
                    help="skip the torch-reference comparison (bf16 "
                         "validation only)")
    ap.add_argument("--uint8-size", type=int, default=0, metavar="H",
                    help="also validate the uint8 wire format vs the f32 "
                         "wire with the trained weights at HxH*1.75 "
                         "(saved-PNG agreement in LSBs); 0 disables")
    ap.add_argument("--vgg", default="off",
                    help="'off' (default), 'random' (random VGG19 params "
                         "— trains the FULL reference objective "
                         "L1+0.1*FFT+0.01*VGG, VERDICT-r2 #2), or a "
                         "torchvision vgg19 .pth path")
    args = ap.parse_args()

    from fdn_tip2025_tpu.metrics import calculate_psnr

    os.makedirs(args.out, exist_ok=True)
    print(f"training FDN {args.iters} iters @ {args.train_size}px "
          f"batch {args.batch} (vgg={args.vgg}) ...", flush=True)
    tr, losses = train_fdn(args.iters, args.train_size, args.batch,
                           lr=args.lr, vgg=args.vgg)
    print(f"loss {losses[0]:.3f} -> {losses[-1]:.3f}", flush=True)

    from fdn_tip2025_tpu.checkpoint.manager import export_torch_pth
    pth = os.path.join(args.out, "fdn_cross.pth")
    export_torch_pth(tr.params, pth)

    # held-out eval pairs (different seed than training)
    rng = np.random.default_rng(123)
    pairs = [synth_pair(rng, args.eval_size) for _ in range(2)]
    lq = np.stack([p[0] for p in pairs])
    gt = np.stack([p[1] for p in pairs])

    result = {
        "iters": args.iters, "train_size": args.train_size,
        "eval_size": args.eval_size, "vgg": args.vgg,
        "loss_first": round(losses[0], 4), "loss_last": round(losses[-1], 4),
        "loss_curve": [round(l, 4) for l in
                       losses[::max(1, len(losses) // 20)]],
    }

    # lolblur inference protocol: ratio straight from the real LPNet
    # checkpoint (inference_fdn_lolblur.py:65-71) — run it in BOTH
    # implementations and require agreement.
    from fdn_tip2025_tpu.inference import FDNPredictor
    pred = FDNPredictor(variant="lolblur", fdn_ckpt=pth,
                        lpnet_ckpt=LPNET_CKPT)
    ratio_ours = pred.predict_ratio(lq)
    ratio = ratio_ours.astype(np.float32)  # identical input to both FDNs

    if not args.skip_torch:
        ratio_ref = reference_lpnet_ratio(lq)
        result["ratio_maxdiff"] = float(np.abs(ratio_ours - ratio_ref).max())
        ours = pred.restore(lq, ratio=ratio)
        print("running torch reference forward (CPU) ...", flush=True)
        ref = reference_forward(pth, lq, ratio)

        o8 = np.clip(ours, 0, 1) * 255.0
        r8 = np.clip(ref, 0, 1) * 255.0
        g8 = gt * 255.0
        mean_psnr = lambda a, b: float(np.mean([  # noqa: E731
            calculate_psnr(a[i], b[i], crop_border=0)
            for i in range(len(a))]))
        result["cross_psnr_db"] = round(mean_psnr(o8, r8), 2)
        # restoration quality context (both should beat the input)
        result["psnr_ours_vs_gt"] = round(mean_psnr(o8, g8), 2)
        result["psnr_ref_vs_gt"] = round(mean_psnr(r8, g8), 2)
        result["psnr_input_vs_gt"] = round(mean_psnr(lq * 255.0, g8), 2)
        # chaos context: reference vs itself under 1e-6 input perturbation
        ref_p = reference_forward(
            pth, (lq + 1e-6).astype(np.float32), ratio)
        result["ref_selfchaos_psnr_db"] = round(
            mean_psnr(np.clip(ref_p, 0, 1) * 255.0, r8), 2)

    if args.bf16_size:
        # bf16 serving accuracy vs f32 with the SAME trained weights
        # (VERDICT r1 #3) at eval-protocol aspect (1120x640 when
        # --bf16-size 640): PSNR + SSIM between the two restored outputs.
        import jax.numpy as jnp

        from fdn_tip2025_tpu.metrics import calculate_ssim

        h = args.bf16_size
        w = int(np.ceil(h * 1.75 / 32) * 32)
        big = synth_pair(np.random.default_rng(7), max(h, w))[0][:h, :w]
        pred16 = FDNPredictor(variant="lolblur", fdn_ckpt=pth,
                              lpnet_ckpt=LPNET_CKPT, dtype=jnp.bfloat16)
        r_big = pred.predict_ratio(big)
        out32 = np.clip(pred.restore(big, ratio=r_big), 0, 1) * 255.0
        out16 = np.clip(pred16.restore(big, ratio=r_big), 0, 1) * 255.0
        result["bf16_vs_f32_psnr_db"] = round(float(
            calculate_psnr(out16, out32, crop_border=0)), 2)
        result["bf16_vs_f32_ssim"] = round(float(
            calculate_ssim(out16, out32, crop_border=0)), 4)
        result["bf16_eval_hw"] = [h, w]

    if args.uint8_size:
        # uint8 wire format vs f32 wire with the SAME trained weights:
        # real inputs are PNG-uint8 anyway, so uint8 ingress is identical
        # data; this measures residual compile-plan ULP differences
        # between the two jit programs after tensor2img quantization
        # (chaos makes this meaningless with random weights —
        # OPTIMIZATIONS.md round-4 serving-wire entry).
        import jax.numpy as jnp

        h = args.uint8_size
        w = int(np.ceil(h * 1.75 / 32) * 32)
        u8 = np.round(np.clip(
            synth_pair(np.random.default_rng(9), max(h, w))[0][:h, :w],
            0, 1) * 255.0).astype(np.uint8)
        f32 = u8.astype(np.float32) / 255.0
        for tag, p in [("f32", pred),
                       ("bf16", FDNPredictor(
                           variant="lolblur", fdn_ckpt=pth,
                           lpnet_ckpt=LPNET_CKPT, dtype=jnp.bfloat16))]:
            r = p.predict_ratio(f32)
            q_f = np.round(np.clip(p.restore(f32, ratio=r), 0, 1)
                           * 255.0).astype(np.uint8)
            out_u = p.restore(u8, ratio=r, output="uint8")
            diff = np.abs(q_f.astype(int) - out_u.astype(int))
            result[f"uint8_wire_{tag}_max_lsb"] = int(diff.max())
            result[f"uint8_wire_{tag}_frac_diff"] = round(
                float((diff > 0).mean()), 6)
            result[f"uint8_wire_{tag}_psnr_db"] = round(float(
                calculate_psnr(q_f.astype(np.float64),
                               out_u.astype(np.float64), crop_border=0)),
                2)
        result["uint8_eval_hw"] = [h, w]
    print(json.dumps(result))
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main()
