"""Validation loop.

Parity: reference dist_validation/nondist_validation
(image_restoration_model.py:713-898): per-image forward at pad-to-x32,
PSNR/SSIM vs GT on uint8-rounded images, optional result-image dump,
metric averaging. The reference shards images across ranks and
dist.reduces sums (:728-731, :864-889); the single-process SPMD analog
is the batched path below — same-shape images stack into one batch that
a mesh-sharded predictor splits across devices (tools/test.py --mesh),
and the metric average needs no collective because all scores land in
this process.
"""

import os

import numpy as np

from fdn_tip2025_tpu.metrics import get_metric
from fdn_tip2025_tpu.utils.img_io import tensor2img, imwrite


def _score(results, metrics_opt, sample, out, save_dir, rgb2bgr,
           use_image):
    sr_img = tensor2img(out, rgb2bgr=rgb2bgr)
    gt_img = tensor2img(sample["gt"], rgb2bgr=rgb2bgr)
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
            results[name] += fn(np.asarray(out),
                                np.asarray(sample["gt"]), **m_opt)


def validate(predict_fn, dataset, metrics_opt, save_dir=None,
             max_images=None, rgb2bgr=True, use_image=True,
             predict_batch_fn=None, batch_size=1):
    """predict_fn: (lq HWC float [0,1], gt) -> restored HWC float.

    predict_batch_fn (optional): (lq (B,H,W,3), gt (B,H,W,3)) ->
    (B,H,W,3) — when given with batch_size > 1, consecutive same-shape
    images are stacked and restored in one call (the dist_test.sh
    analog: a mesh-sharded predictor splits the batch over devices).
    Mixed-shape sets fall back to smaller groups at shape boundaries.

    metrics_opt: {'psnr': {'type': 'calculate_psnr', 'crop_border': 0, ...}}
    Returns {metric: mean}.
    """
    results = {name: 0.0 for name in metrics_opt}
    n_total = len(dataset)
    if max_images is not None:
        n_total = min(n_total, max_images)

    n = 0
    if predict_batch_fn is not None and batch_size > 1:
        buf = []

        def flush():
            nonlocal n
            if not buf:
                return
            lqs = np.stack([np.asarray(s["lq"], np.float32) for s in buf])
            gts = np.stack([np.asarray(s["gt"], np.float32) for s in buf])
            outs = predict_batch_fn(lqs, gts)
            for s, o in zip(buf, outs):
                _score(results, metrics_opt, s, o, save_dir, rgb2bgr,
                       use_image)
                n += 1
            buf.clear()

        last_shape = None
        for idx in range(n_total):
            sample = dataset[idx]
            shape = np.asarray(sample["lq"]).shape
            if buf and (shape != last_shape or len(buf) >= batch_size):
                flush()
            buf.append(sample)
            last_shape = shape
        flush()
    else:
        for idx in range(n_total):
            sample = dataset[idx]
            out = predict_fn(sample["lq"], sample["gt"])
            _score(results, metrics_opt, sample, out, save_dir, rgb2bgr,
                   use_image)
            n += 1
    return {k: v / max(n, 1) for k, v in results.items()}
