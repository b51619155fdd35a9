"""Training-time paired transforms (numpy HWC, host-side).

Parity: reference basicsr/data/transforms.py — paired_random_crop (:26-85),
augment (:150-217, hflip / vflip / rot90-via-transpose sharing one random
draw across the pair), mod_crop (:7-23).
"""

import numpy as np


def mod_crop(img, scale):
    h, w = img.shape[:2]
    return img[: h - h % scale, : w - w % scale, ...]


def paired_random_crop(img_gt, img_lq, gt_patch_size, scale, rng):
    h_lq, w_lq = img_lq.shape[:2]
    lq_patch = gt_patch_size // scale
    if h_lq < lq_patch or w_lq < lq_patch:
        raise ValueError(
            f"LQ ({h_lq},{w_lq}) smaller than patch {lq_patch}")
    top = int(rng.integers(0, h_lq - lq_patch + 1))
    left = int(rng.integers(0, w_lq - lq_patch + 1))
    lq = img_lq[top:top + lq_patch, left:left + lq_patch, ...]
    gt = img_gt[top * scale:top * scale + gt_patch_size,
                left * scale:left * scale + gt_patch_size, ...]
    return gt, lq


def paired_random_crop_hw(img_gt, img_lq, gt_patch_h, gt_patch_w, scale,
                          rng):
    """Rectangular paired random crop (reference transforms.py:88-148).

    Like paired_random_crop but with independent H/W patch sizes; the lq
    crop is (gt_patch_h // scale, gt_patch_w // scale) and the gt crop
    starts at the scaled lq origin. Unused by the three FDN configs (the
    reference only calls the square variant, paired_image_dataset.py:127)
    but part of the enumerated §2.5 surface.
    """
    h_lq, w_lq = img_lq.shape[:2]
    lq_patch_h = gt_patch_h // scale
    lq_patch_w = gt_patch_w // scale
    if h_lq < lq_patch_h or w_lq < lq_patch_w:
        raise ValueError(
            f"LQ ({h_lq},{w_lq}) smaller than patch "
            f"({lq_patch_h},{lq_patch_w})")
    top = int(rng.integers(0, h_lq - lq_patch_h + 1))
    left = int(rng.integers(0, w_lq - lq_patch_w + 1))
    lq = img_lq[top:top + lq_patch_h, left:left + lq_patch_w, ...]
    gt = img_gt[top * scale:top * scale + gt_patch_h,
                left * scale:left * scale + gt_patch_w, ...]
    return gt, lq


def augment_pair(imgs, hflip=True, rotation=True, rng=None):
    """Same random hflip/vflip/rot90 applied to every image in `imgs`."""
    rng = rng or np.random.default_rng()
    do_h = hflip and rng.random() < 0.5
    do_v = rotation and rng.random() < 0.5
    do_r = rotation and rng.random() < 0.5

    def f(img):
        if do_h:
            img = img[:, ::-1, :]
        if do_v:
            img = img[::-1, :, :]
        if do_r:
            img = img.transpose(1, 0, 2)
        return np.ascontiguousarray(img)

    return [f(i) for i in imgs]
