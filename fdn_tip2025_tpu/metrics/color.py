"""Color conversions matching the reference's MATLAB-faithful functions.

Parity: basicsr/utils/matlab_functions.py (bgr2ycbcr/rgb2ycbcr) and
basicsr/metrics/metric_util.py (reorder_image, to_y_channel).
"""

import numpy as np


def rgb2ycbcr(img, y_only=False):
    """img: float [0,1] or uint8-range [0,255], HWC RGB."""
    img_type = img.dtype
    img = img.astype(np.float64)
    if img_type != np.uint8:
        img *= 255.0
    if y_only:
        out = np.dot(img, [65.481, 128.553, 24.966]) / 255.0 + 16.0
    else:
        out = np.matmul(
            img,
            np.array([[65.481, -37.797, 112.0],
                      [128.553, -74.203, -93.786],
                      [24.966, 112.0, -18.214]]) / 255.0,
        ) + [16, 128, 128]
    if img_type != np.uint8:
        out /= 255.0
    else:
        out = out.round()
    return out.astype(img_type if img_type == np.uint8 else np.float64)


def bgr2ycbcr(img, y_only=False):
    return rgb2ycbcr(img[..., ::-1], y_only=y_only)


def to_y_channel(img):
    """Reference metric_util.to_y_channel: [0,255] BGR -> Y in [0,255]."""
    img = img.astype(np.float64) / 255.0
    if img.ndim == 3 and img.shape[2] == 3:
        img = bgr2ycbcr(img, y_only=True)
        img = img[..., None]
    return img * 255.0


def reorder_image(img, input_order="HWC"):
    if input_order not in ("HWC", "CHW"):
        raise ValueError(input_order)
    if img.ndim == 2:
        return img[..., None]
    if input_order == "CHW":
        return img.transpose(1, 2, 0)
    return img
