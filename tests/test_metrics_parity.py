"""Metric parity vs the reference implementations (CPU-patched)."""

import numpy as np
import pytest
import torch

from fdn_tip2025_tpu.metrics import calculate_psnr, calculate_ssim
from tests.torch_ref import import_ref_arch  # installs stubs, sys.path


def _ref_metrics(monkeypatch):
    import_ref_arch("FDN_arch")  # ensure stubs + path
    # The reference's _ssim_3d calls .cuda(); run it on CPU instead.
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self, raising=False)
    from basicsr.metrics import psnr_ssim
    return psnr_ssim


@pytest.fixture
def imgs(rng):
    a = rng.random((64, 80, 3)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1)
    return a, b


def test_psnr_parity(imgs, monkeypatch):
    ref_mod = _ref_metrics(monkeypatch)
    a, b = imgs
    ref = ref_mod.calculate_psnr(a, b, crop_border=0)
    got = calculate_psnr(a, b, crop_border=0)
    assert abs(ref - got) < 1e-8


def test_psnr_255(imgs, monkeypatch):
    ref_mod = _ref_metrics(monkeypatch)
    a, b = imgs
    a255, b255 = a * 255, b * 255
    ref = ref_mod.calculate_psnr(a255, b255, crop_border=4)
    got = calculate_psnr(a255, b255, crop_border=4)
    assert abs(ref - got) < 1e-8


def test_psnr_ssim_stereo6_parity(rng, monkeypatch):
    """6-channel stereo split (reference :65-70, :324-328): per-half avg."""
    ref_mod = _ref_metrics(monkeypatch)
    a = rng.random((48, 56, 6)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1)
    ref = ref_mod.calculate_psnr(a, b, crop_border=2)
    got = calculate_psnr(a, b, crop_border=2)
    assert abs(ref - got) < 1e-8
    ref = ref_mod.calculate_ssim(a, b, crop_border=0, ssim3d=True)
    got = calculate_ssim(a, b, crop_border=0, ssim3d=True)
    assert abs(ref - got) < 2e-5, (ref, got)


def test_ssim3d_parity(imgs, monkeypatch):
    ref_mod = _ref_metrics(monkeypatch)
    a, b = imgs
    ref = ref_mod.calculate_ssim(a, b, crop_border=0, ssim3d=True)
    got = calculate_ssim(a, b, crop_border=0, ssim3d=True)
    assert abs(ref - got) < 2e-5, (ref, got)


def test_ssim2d_parity(imgs, monkeypatch):
    ref_mod = _ref_metrics(monkeypatch)
    a, b = imgs
    ref = ref_mod.calculate_ssim(a, b, crop_border=0, ssim3d=False)
    got = calculate_ssim(a, b, crop_border=0, ssim3d=False)
    assert abs(ref - got) < 1e-8


def test_niqe_parity(rng, monkeypatch):
    ref_mod = _ref_metrics(monkeypatch)
    import os
    if not os.path.exists(
            "/root/reference/basicsr/metrics/niqe_pris_params.npz"):
        pytest.skip("pristine params not mounted")
    from basicsr.metrics.niqe import calculate_niqe as ref_niqe
    from fdn_tip2025_tpu.metrics.niqe import calculate_niqe
    img = (rng.random((200, 220, 3)) * 255).astype(np.float32)
    cwd = os.getcwd()
    os.chdir("/root/reference")  # ref loads params from a relative path
    try:
        ref = ref_niqe(img, crop_border=0)
    finally:
        os.chdir(cwd)
    got = calculate_niqe(img, crop_border=0)
    assert abs(float(np.ravel(ref)[0]) - got) < 1e-3, (ref, got)
