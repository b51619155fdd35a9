#!/usr/bin/env python
"""Training-step throughput benchmark (single chip or mesh).

The reference recipe trains FDN on 4 GPUs x batch 4 at 128x128 crops
(options/train/FDN.yml:19-26, fdn.sh) — here the same global batch runs
on however many chips are visible, batch-sharded over the mesh. Prints
ONE JSON line: {"metric": "fdn_train_throughput", "value": imgs/sec,
"unit": "images/sec", "batch": B, "crop": S}.

  python tools/bench_train.py --batch 16 --crop 128 --model fdn
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16,
                    help="global batch (reference: 4 GPUs x 4)")
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--model", default="fdn",
                    choices=["fdn", "mar", "lpnet"])
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--amp", action="store_true",
                    help="bf16 mixed precision (train.mixed_precision)")
    args = ap.parse_args()

    import numpy as np
    import jax
    from fdn_tip2025_tpu.parallel.mesh import make_mesh
    from fdn_tip2025_tpu.train.engine import create_trainer

    model_type = {"fdn": "ImageRestorationModel",
                  "mar": "ImageRestorationModel_ipretrain",
                  "lpnet": "ImageRestorationModel_ipred"}[args.model]
    opt = {
        "name": "bench", "model_type": model_type, "scale": 1,
        "manual_seed": 0, "use_ratio": True,
        "train": {
            "optim_g": {"type": "AdamW", "lr": 1e-3, "weight_decay": 1e-3,
                        "betas": [0.9, 0.9]},
            "scheduler": {"type": "TrueCosineAnnealingLR",
                          "T_max": 500000, "eta_min": 1e-7},
            "total_iter": 500000, "warmup_iter": -1,
            "mixed_precision": bool(args.amp),
        },
    }
    mesh = make_mesh()
    trainer = create_trainer(opt, mesh=mesh)
    rng = np.random.default_rng(0)
    batch = {
        "lq": rng.random((args.batch, args.crop, args.crop, 3),
                         dtype=np.float32),
        "gt": rng.random((args.batch, args.crop, args.crop, 3),
                         dtype=np.float32),
    }
    for _ in range(args.warmup):
        aux = trainer.train_step(batch)
    float(aux["l_total"])  # sync

    t0 = time.perf_counter()
    for _ in range(args.steps):
        aux = trainer.train_step(batch)
    loss = float(aux["l_total"])  # one D2H sync drains the pipeline
    dt = (time.perf_counter() - t0) / args.steps
    print(json.dumps({
        "metric": f"{args.model}_train_throughput",
        "value": round(args.batch / dt, 2),
        "unit": "images/sec",
        "batch": args.batch, "crop": args.crop,
        "step_ms": round(dt * 1e3, 1), "loss": round(loss, 4),
        "devices": int(mesh.devices.size), "amp": bool(args.amp),
    }))


if __name__ == "__main__":
    main()
