"""PSNR and SSIM (2-D and 3-D Gaussian) — the in-training fidelity metrics.

Parity: reference basicsr/metrics/psnr_ssim.py — calculate_psnr (:8-70,
float64, auto max-value), _ssim (:84-117, cv2 11x11 Gaussian, valid crop),
_ssim_3d (:163-200 + :243-329, 11x11x11 Gaussian, replicate padding, runs
on accelerator). Images are HWC float arrays in [0, 1] or [0, 255].

The 3-D SSIM conv is implemented with lax.conv_general_dilated so it runs
jitted on TPU; goldens are checked against a CPU-patched run of the
reference implementation.
"""

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _as_hwc_f64(img):
    img = np.asarray(img, dtype=np.float64)
    if img.ndim == 2:
        img = img[..., None]
    return img


def calculate_psnr(img1, img2, crop_border=0, input_order="HWC",
                   test_y_channel=False):
    """PSNR with the reference's auto max-value (1.0 if <=1 else 255)."""
    img1 = _as_hwc_f64(img1)
    img2 = _as_hwc_f64(img2)
    assert img1.shape == img2.shape, (img1.shape, img2.shape)
    if input_order == "CHW":
        img1 = img1.transpose(1, 2, 0)
        img2 = img2.transpose(1, 2, 0)
    if crop_border:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]

    def _psnr(a, b):
        if test_y_channel:
            from fdn_tip2025_tpu.metrics.color import to_y_channel
            a = to_y_channel(a)
            b = to_y_channel(b)
        mse = np.mean((a - b) ** 2)
        if mse == 0:
            return float("inf")
        max_value = 1.0 if a.max() <= 1 else 255.0
        return 20.0 * np.log10(max_value / np.sqrt(mse))

    # stereo quirk (reference :65-70): 6-channel = left|right pair,
    # scored per 3-channel half and averaged
    if img1.shape[2] == 6:
        return (_psnr(img1[:, :, :3], img2[:, :, :3])
                + _psnr(img1[:, :, 3:], img2[:, :, 3:])) / 2
    return _psnr(img1, img2)


@lru_cache(maxsize=None)
def _gaussian_kernel_1d(size=11, sigma=1.5):
    # cv2.getGaussianKernel semantics
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / k.sum()


@lru_cache(maxsize=None)
def _kernel3d():
    # numpy, not jnp: this is called inside the _ssim3d_map trace, and an
    # lru_cache'd jnp value created there would be a leaked tracer on the
    # next retrace (new input shape). A numpy constant is trace-safe.
    k = _gaussian_kernel_1d()
    w = np.einsum("i,j,k->ijk", k, k, k)
    return np.asarray(w, np.float32)


@jax.jit
def _ssim3d_map(img1, img2, c1, c2):
    """img: (D, H, W) float32. Replicate-padded 11^3 Gaussian SSIM map."""
    w = _kernel3d()[None, None]  # OIDHW

    def conv(x):
        x = jnp.pad(x, ((5, 5), (5, 5), (5, 5)), mode="edge")
        return lax.conv_general_dilated(
            x[None, None], w, (1, 1, 1), "VALID",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))[0, 0]

    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu1_mu2
    num = (2 * mu1_mu2 + c1) * (2 * s12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    return jnp.mean(num / den)


def _ssim_3d(img1, img2, max_value):
    c1 = (0.01 * max_value) ** 2
    c2 = (0.03 * max_value) ** 2
    # HWC -> CHW ("depth" = channel), float32 like the reference's .float()
    a = jnp.asarray(img1.transpose(2, 0, 1), jnp.float32)
    b = jnp.asarray(img2.transpose(2, 0, 1), jnp.float32)
    return float(_ssim3d_map(a, b, c1, c2))


def _ssim_2d(img1, img2, max_value):
    """cv2-filter2D variant (reference _ssim :84-117): reflect101 border,
    valid 5-px crop."""
    c1 = (0.01 * max_value) ** 2
    c2 = (0.03 * max_value) ** 2
    k = _gaussian_kernel_1d()
    window = np.outer(k, k)

    import cv2
    def f(x):
        return cv2.filter2D(x, -1, window)[5:-5, 5:-5]

    mu1, mu2 = f(img1), f(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = f(img1 ** 2) - mu1_sq
    s2 = f(img2 ** 2) - mu2_sq
    s12 = f(img1 * img2) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return ssim_map.mean()


def calculate_ssim(img1, img2, crop_border=0, input_order="HWC",
                   test_y_channel=False, ssim3d=True):
    img1 = _as_hwc_f64(img1)
    img2 = _as_hwc_f64(img2)
    assert img1.shape == img2.shape
    if input_order == "CHW":
        img1 = img1.transpose(1, 2, 0)
        img2 = img2.transpose(1, 2, 0)
    if crop_border:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    def _cal(a, b):
        if test_y_channel:
            from fdn_tip2025_tpu.metrics.color import to_y_channel
            a = to_y_channel(a)[..., 0]
            b = to_y_channel(b)[..., 0]
            return _ssim_2d(a, b, 255.0)
        max_value = 1.0 if a.max() <= 1 else 255.0
        if ssim3d:
            return _ssim_3d(a, b, max_value)
        return _ssim_2d(a, b, max_value)

    # stereo quirk (reference :324-328): 6-channel pair averaged
    if img1.shape[2] == 6:
        return (_cal(img1[:, :, :3], img2[:, :, :3])
                + _cal(img1[:, :, 3:], img2[:, :, 3:])) / 2
    return _cal(img1, img2)
