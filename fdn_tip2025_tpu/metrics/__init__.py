"""Metrics: PSNR, SSIM (2-D/3-D), NIQE, LPIPS (weights optional).

Dispatch-by-name mirrors basicsr/metrics/__init__.py + the YAML metric
configs (e.g. type: calculate_psnr)."""

from fdn_tip2025_tpu.metrics.psnr_ssim import calculate_psnr, calculate_ssim
from fdn_tip2025_tpu.metrics.color import (
    rgb2ycbcr, bgr2ycbcr, to_y_channel, reorder_image,
)


# Plugin metrics (the reference's m.py accepts ANY pyiqa metric name,
# m.py:72 — musiq, nima, ... — via pyiqa's model zoo; pyiqa and its
# weights are not in this image, so the equivalent surface here is a
# registry: plugins register a callable and the CLIs dispatch by name).
_EXTRA = {}


def register_metric(name, fn):
    """Register a custom metric under `name` for get_metric / the
    tools/metrics_gate.py CLI (--plugin). fn(img, ref) -> float with
    img/ref as RGB float [0,1] HWC arrays; no-reference metrics ignore
    `ref`."""
    _EXTRA[name] = fn
    return fn


def available_metrics():
    from fdn_tip2025_tpu.metrics import niqe as _niqe
    table = {
        "calculate_psnr": calculate_psnr,
        "calculate_ssim": calculate_ssim,
        "calculate_niqe": _niqe.calculate_niqe,
    }
    table.update(_EXTRA)
    return table


def get_metric(name):
    return available_metrics()[name]
