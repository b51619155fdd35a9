"""MATLAB-faithful imresize (cubic, antialiased).

Parity: reference basicsr/utils/matlab_functions.py:88-361 (imresize) —
the bicubic kernel with antialias widening on downscale, symmetric edge
indices, used by the NIQE pipeline and MATLAB-protocol evaluation.
Implemented independently from the published MATLAB algorithm.
"""

import numpy as np


def _cubic(x):
    ax = np.abs(x)
    ax2, ax3 = ax ** 2, ax ** 3
    f = ((1.5 * ax3 - 2.5 * ax2 + 1) * (ax <= 1) +
         (-0.5 * ax3 + 2.5 * ax2 - 4 * ax + 2) * ((ax > 1) & (ax <= 2)))
    return f


def _contributions(in_len, out_len, scale, kernel_width):
    if scale < 1:
        kernel_width = kernel_width / scale
    x = np.arange(1, out_len + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(np.ceil(kernel_width)) + 2
    indices = left[:, None] + np.arange(p)[None]
    dist = u[:, None] - indices
    if scale < 1:
        weights = scale * _cubic(dist * scale)
    else:
        weights = _cubic(dist)
    weights = weights / np.sum(weights, axis=1, keepdims=True)
    # symmetric (mirror) boundary handling like MATLAB; `indices` are
    # 1-based (u was computed on 1-based coordinates) — shift before mod.
    aux = np.concatenate([np.arange(in_len), np.arange(in_len - 1, -1, -1)])
    indices = aux[np.mod(indices.astype(np.int64) - 1, aux.size)]
    # trim all-zero weight columns
    keep = ~np.all(weights == 0, axis=0)
    return weights[:, keep], indices[:, keep]


def imresize(img, scale=None, out_shape=None):
    """img: HW or HWC float array. MATLAB imresize(img, scale, 'bicubic')."""
    img = np.asarray(img, np.float64)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    if out_shape is not None:
        oh, ow = out_shape
        sh, sw = oh / h, ow / w
    else:
        sh = sw = scale
        oh, ow = int(np.ceil(h * sh)), int(np.ceil(w * sw))
    wts_h, idx_h = _contributions(h, oh, sh, 4.0)
    wts_w, idx_w = _contributions(w, ow, sw, 4.0)
    out = np.einsum("ok,okwc->owc", wts_h, img[idx_h, :, :])
    out = np.einsum("ok,hokc->hoc", wts_w, out[:, idx_w, :])
    return out[..., 0] if squeeze else out
