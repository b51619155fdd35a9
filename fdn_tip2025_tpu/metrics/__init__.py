"""Metrics: PSNR, SSIM (2-D/3-D), NIQE, LPIPS (weights optional).

Dispatch-by-name mirrors basicsr/metrics/__init__.py + the YAML metric
configs (e.g. type: calculate_psnr)."""

from fdn_tip2025_tpu.metrics.psnr_ssim import calculate_psnr, calculate_ssim
from fdn_tip2025_tpu.metrics.color import (
    rgb2ycbcr, bgr2ycbcr, to_y_channel, reorder_image,
)


def get_metric(name):
    from fdn_tip2025_tpu.metrics import niqe as _niqe
    table = {
        "calculate_psnr": calculate_psnr,
        "calculate_ssim": calculate_ssim,
        "calculate_niqe": _niqe.calculate_niqe,
    }
    return table[name]
