"""End-to-end golden pipeline (VERDICT r1 #8): train FDN briefly on a
fixed dark->bright pair, then evaluate through the validation path
(pad-to-x32 + GT-ratio protocol) and require the restored image to beat
the input's PSNR vs GT — direct evidence the flagship train->eval loop
learns, not just that the loss is finite."""

import numpy as np
import pytest

from fdn_tip2025_tpu.metrics import calculate_psnr
from fdn_tip2025_tpu.parallel.mesh import make_mesh
from fdn_tip2025_tpu.train.engine import create_trainer
from fdn_tip2025_tpu.train.infer_adapters import make_predict_fn


@pytest.mark.slow
def test_fdn_train_then_eval_improves_psnr(rng):
    lq = (rng.random((1, 32, 32, 3)) * 0.2).astype(np.float32)
    gt = np.clip(lq * 4.0 + 0.05, 0.0, 1.0).astype(np.float32)
    opt = {
        "name": "e2e", "model_type": "ImageRestorationModel", "scale": 1,
        "manual_seed": 0, "use_ratio": True,
        "train": {
            "optim_g": {"type": "AdamW", "lr": 2e-3, "weight_decay": 0.0,
                        "betas": [0.9, 0.9]},
            "scheduler": {"type": "TrueCosineAnnealingLR", "T_max": 400,
                          "eta_min": 1e-7},
            "total_iter": 400, "warmup_iter": -1,
        },
    }
    trainer = create_trainer(opt, mesh=make_mesh(1))
    batch = {"lq": lq, "gt": gt}
    first = float(trainer.train_step(batch)["l_total"])
    for _ in range(39):
        last = float(trainer.train_step(batch)["l_total"])
    assert last < first, (first, last)

    predict = make_predict_fn("ImageRestorationModel", trainer)
    out = np.clip(predict(lq[0], gt[0]), 0.0, 1.0)
    psnr_out = calculate_psnr(out * 255, gt[0] * 255, crop_border=0)
    psnr_in = calculate_psnr(lq[0] * 255.0, gt[0] * 255, crop_border=0)
    assert psnr_out > psnr_in, (psnr_out, psnr_in)
