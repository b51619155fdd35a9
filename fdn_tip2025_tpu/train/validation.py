"""Validation loop.

Parity: reference dist_validation/nondist_validation
(image_restoration_model.py:713-898): per-image forward at pad-to-x32,
PSNR/SSIM vs GT on uint8-rounded images, optional result-image dump,
metric averaging. The reference shards images across ranks and
dist.reduces sums (:728-731, :864-889); single-process SPMD needs no
collective — images stream through the one program.
"""

import os

import numpy as np

from fdn_tip2025_tpu.metrics import get_metric
from fdn_tip2025_tpu.utils.img_io import tensor2img, imwrite


def validate(predict_fn, dataset, metrics_opt, save_dir=None,
             max_images=None, rgb2bgr=True, use_image=True):
    """predict_fn: (lq HWC float [0,1]) -> restored HWC float.

    metrics_opt: {'psnr': {'type': 'calculate_psnr', 'crop_border': 0, ...}}
    Returns {metric: mean}.
    """
    results = {name: 0.0 for name in metrics_opt}
    n = 0
    for idx in range(len(dataset)):
        if max_images is not None and idx >= max_images:
            break
        sample = dataset[idx] if not hasattr(dataset, "__getitem__") else \
            dataset.__getitem__(idx)
        lq, gt = sample["lq"], sample["gt"]
        # gt is passed so the predictor can apply the reference's
        # validation ratio protocol mean(gray lq)/mean(gray gt)
        # (image_restoration_model.py:649-658).
        out = predict_fn(lq, gt)
        sr_img = tensor2img(out, rgb2bgr=rgb2bgr)
        gt_img = tensor2img(gt, rgb2bgr=rgb2bgr)
        if save_dir:
            name = os.path.splitext(os.path.basename(sample["lq_path"]))[0]
            imwrite(sr_img, os.path.join(save_dir, f"{name}.png"))
        for name, m_opt in metrics_opt.items():
            m_opt = dict(m_opt)
            fn = get_metric(m_opt.pop("type"))
            if use_image:
                results[name] += fn(sr_img.astype(np.float64),
                                    gt_img.astype(np.float64), **m_opt)
            else:
                results[name] += fn(np.asarray(out), np.asarray(gt),
                                    **m_opt)
        n += 1
    return {k: v / max(n, 1) for k, v in results.items()}
