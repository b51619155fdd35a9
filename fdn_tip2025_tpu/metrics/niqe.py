"""NIQE — no-reference quality metric (MSCN + AGGD features vs pristine MVG).

Parity: reference basicsr/metrics/niqe.py:1-205 (itself MATLAB-faithful).
Algorithm: per 96x96 block at 2 scales, fit asymmetric generalized Gaussian
params to MSCN coefficients and 4 pairwise products, then Mahalanobis
distance between the fitted MVG and the pristine-image MVG.

The pristine-model parameters (mu/cov/gaussian window) are DATA shipped with
the reference (basicsr/metrics/niqe_pris_params.npz). We read them from the
mounted reference tree by default; point NIQE_PRIS_PARAMS elsewhere to
override. Not bundled to keep this repo free of copied artifacts.
"""

import math
import os
from functools import lru_cache

import cv2
import numpy as np
from scipy.ndimage import convolve
from scipy.special import gamma as gamma_fn

from fdn_tip2025_tpu.metrics.color import reorder_image, to_y_channel

DEFAULT_PRIS_PARAMS = os.environ.get(
    "NIQE_PRIS_PARAMS",
    "/root/reference/basicsr/metrics/niqe_pris_params.npz")

# Precompute the alpha lookup table once (reference rebuilds it per block).
_GAM = np.arange(0.2, 10.001, 0.001)
_R_GAM = (gamma_fn(2.0 / _GAM) ** 2
          / (gamma_fn(1.0 / _GAM) * gamma_fn(3.0 / _GAM)))


def _fit_aggd(block):
    block = block.flatten()
    left = block[block < 0]
    right = block[block > 0]
    left_std = np.sqrt(np.mean(left ** 2)) if left.size else np.nan
    right_std = np.sqrt(np.mean(right ** 2)) if right.size else np.nan
    gammahat = left_std / right_std
    rhat = (np.mean(np.abs(block))) ** 2 / np.mean(block ** 2)
    rhatnorm = (rhat * (gammahat ** 3 + 1) * (gammahat + 1)) / (
        (gammahat ** 2 + 1) ** 2)
    alpha = _GAM[np.argmin((_R_GAM - rhatnorm) ** 2)]
    conv = np.sqrt(gamma_fn(1 / alpha) / gamma_fn(3 / alpha))
    return alpha, left_std * conv, right_std * conv


def _block_features(block):
    feat = []
    alpha, bl, br = _fit_aggd(block)
    feat += [alpha, (bl + br) / 2]
    for shift in ((0, 1), (1, 0), (1, 1), (1, -1)):
        prod = block * np.roll(block, shift, axis=(0, 1))
        alpha, bl, br = _fit_aggd(prod)
        mean = (br - bl) * (gamma_fn(2 / alpha) / gamma_fn(1 / alpha))
        feat += [alpha, mean, bl, br]
    return feat


@lru_cache(maxsize=4)
def _load_pris(path):
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"NIQE pristine-model parameters not found at {path!r}. "
            "This is DATA (not code) shipped with the reference as "
            "basicsr/metrics/niqe_pris_params.npz — on a host without "
            "the /root/reference mount, copy it from any FDN/BasicSR "
            "checkout (tools/fetch_niqe_params.py validates + installs "
            "it) and set NIQE_PRIS_PARAMS=/path/to/niqe_pris_params.npz.")
    z = np.load(path)
    return (z["mu_pris_param"], z["cov_pris_param"], z["gaussian_window"])


def niqe_score(img, mu_pris, cov_pris, window, block=96):
    h, w = img.shape
    nbh, nbw = math.floor(h / block), math.floor(w / block)
    if nbh == 0 or nbw == 0:
        # the reference crashes on an empty resize here; fail clearly
        raise ValueError(
            f"image too small for NIQE: {h}x{w} after crop, needs at "
            f"least one {block}x{block} block")
    img = img[: nbh * block, : nbw * block]
    dist = []
    for scale in (1, 2):
        mu = convolve(img, window, mode="nearest")
        sigma = np.sqrt(np.abs(
            convolve(img ** 2, window, mode="nearest") - mu ** 2))
        norm = (img - mu) / (sigma + 1)
        feats = []
        for iw in range(nbw):
            for ih in range(nbh):
                b = block // scale
                feats.append(_block_features(
                    norm[ih * b:(ih + 1) * b, iw * b:(iw + 1) * b]))
        dist.append(np.array(feats))
        if scale == 1:
            hh, ww = img.shape
            img = cv2.resize(img / 255.0, (ww // 2, hh // 2),
                             interpolation=cv2.INTER_LINEAR) * 255.0
    dist = np.concatenate(dist, axis=1)
    mu_d = np.nanmean(dist, axis=0)
    cov_d = np.cov(dist[~np.isnan(dist).any(axis=1)], rowvar=False)
    invcov = np.linalg.pinv((cov_pris + cov_d) / 2)
    diff = (np.ravel(mu_pris) - mu_d)
    return float(np.sqrt(diff @ invcov @ diff))


def calculate_niqe(img, crop_border=0, input_order="HWC", convert_to="y",
                   pris_params_path=DEFAULT_PRIS_PARAMS):
    """img: [0,255] float/uint, BGR when HWC (reference convention)."""
    mu, cov, window = _load_pris(pris_params_path)
    img = img.astype(np.float32)
    if input_order != "HW":
        img = reorder_image(img, input_order=input_order)
        if convert_to == "y":
            img = to_y_channel(img)
        elif convert_to == "gray":
            img = cv2.cvtColor(img / 255.0, cv2.COLOR_BGR2GRAY) * 255.0
        img = np.squeeze(img)
    if crop_border:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    return niqe_score(img, mu, cov, window)
