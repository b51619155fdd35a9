"""Image IO matching the reference's img_util semantics.

Parity: basicsr/utils/img_util.py — img2tensor (:9-38, BGR->RGB, /255
upstream), tensor2img (:41-118, clamp 0..1 -> uint8 round), imwrite
(:121-139, auto-mkdir), padding (:142-157, reflect to min size).
Arrays here are NHWC float32 RGB in [0, 1]; cv2 reads/writes BGR uint8.
"""

import os

import cv2
import numpy as np


def imread(path, float32=True):
    """Read an image file -> HWC RGB float32 [0, 1] (cv2 BGR -> RGB)."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if float32:
        img = img.astype(np.float32) / 255.0
    return img


def img_to_batch(img):
    """HWC -> (1, H, W, C)."""
    return img[None]


def tensor2img(x, rgb2bgr=True, min_max=(0, 1)):
    """(H,W,C) or (B,H,W,C) float -> HWC uint8, reference rounding."""
    x = np.asarray(x)
    if x.ndim == 4:
        x = x[0]
    x = np.clip(x, min_max[0], min_max[1])
    x = (x - min_max[0]) / (min_max[1] - min_max[0])
    if rgb2bgr:
        x = x[..., ::-1]
    return (x * 255.0).round().astype(np.uint8)


def imwrite(img, path, auto_mkdir=True):
    """Write HWC uint8 BGR (cv2 convention) to path."""
    if auto_mkdir:
        d = os.path.dirname(os.path.abspath(path))
        os.makedirs(d, exist_ok=True)
    ok = cv2.imwrite(path, img)
    if not ok:
        raise IOError(f"failed writing {path}")
    return ok


def padding_min_size(img_lq, img_gt, gt_size):
    """Reflect-pad a training pair up to at least gt_size (HWC numpy).

    Parity: basicsr/utils/img_util.py:142-157 (cv2.BORDER_REFLECT_101).
    """
    h, w = img_lq.shape[:2]
    h_pad = max(0, gt_size - h)
    w_pad = max(0, gt_size - w)
    if h_pad == 0 and w_pad == 0:
        return img_lq, img_gt
    img_lq = cv2.copyMakeBorder(img_lq, 0, h_pad, 0, w_pad,
                                cv2.BORDER_REFLECT_101)
    img_gt = cv2.copyMakeBorder(img_gt, 0, h_pad, 0, w_pad,
                                cv2.BORDER_REFLECT_101)
    return img_lq, img_gt
