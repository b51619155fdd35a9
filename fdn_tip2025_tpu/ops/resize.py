"""Resampling primitives with torch-exact semantics (NHWC).

The reference mixes two resize flavors that must not be confused
(SURVEY.md §7 "hard parts" #2):
  * F.interpolate(scale_factor=...) with the default mode='nearest'
    (MAR multiscale pyramid, FDN_arch.py:205-206, 230-233) — torch legacy
    nearest: src = floor(dst * in/out).
  * nn.Upsample(mode='bilinear', align_corners=False) (FDN_arch.py:265,
    719, 730, 806-807, 866-867) — half-pixel-center bilinear, NO antialias
    even when downscaling.

All shapes are static under jit, so index math happens at trace time.
"""

import numpy as np
import jax.numpy as jnp
from jax import lax


def interp_nearest(x, scale_factor):
    """torch F.interpolate(x, scale_factor, mode='nearest') for NHWC.

    torch computes out_size = floor(in * scale) and maps
    src = min(floor(dst * in/out), in-1).
    """
    b, h, w, c = x.shape
    oh = int(np.floor(h * scale_factor))
    ow = int(np.floor(w * scale_factor))
    hi = np.minimum((np.arange(oh) * (h / oh)).astype(np.int64), h - 1)
    wi = np.minimum((np.arange(ow) * (w / ow)).astype(np.int64), w - 1)
    return x[:, hi][:, :, wi]


def _bilinear_weights(in_size, out_size, scale=None):
    """Half-pixel (align_corners=False) source indices and lerp weights.

    torch uses the reciprocal of the *given* scale_factor for the coordinate
    mapping (recompute_scale_factor=False default), not in/out — they differ
    when floor() truncates the output size.
    """
    if scale is None:
        scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, None)
    i0 = np.minimum(src.astype(np.int64), in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    frac = np.clip(src - i0, 0.0, 1.0)
    return i0, i1, frac.astype(np.float32)


def interp_bilinear(x, scale_factor=None, size=None):
    """torch nn.Upsample(mode='bilinear', align_corners=False), no antialias.

    Works for both up- and down-scaling (torch does not antialias either).
    """
    b, h, w, c = x.shape
    if size is None:
        oh = int(np.floor(h * scale_factor))
        ow = int(np.floor(w * scale_factor))
        inv = 1.0 / scale_factor
        h0, h1, hf = _bilinear_weights(h, oh, inv)
        w0, w1, wf = _bilinear_weights(w, ow, inv)
    else:
        oh, ow = size
        h0, h1, hf = _bilinear_weights(h, oh)
        w0, w1, wf = _bilinear_weights(w, ow)
    hf = jnp.asarray(hf, x.dtype)[None, :, None, None]
    wf = jnp.asarray(wf, x.dtype)[None, None, :, None]
    top = x[:, h0]
    bot = x[:, h1]
    xh = top + (bot - top) * hf
    left = xh[:, :, w0]
    right = xh[:, :, w1]
    return left + (right - left) * wf


def pixel_unshuffle(x, factor):
    """torch.nn.PixelUnshuffle for NHWC: (B,H,W,C) -> (B,H/f,W/f,C*f*f).

    Channel ordering matches torch: out channel index = c*f*f + fy*f + fx
    (reference uses it at FDN_arch.py:199-200, 207-208).
    """
    b, h, w, c = x.shape
    f = factor
    x = x.reshape(b, h // f, f, w // f, f, c)
    # -> (B, H/f, W/f, C, fy, fx) then flatten last three
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // f, w // f, c * f * f)


def avg_pool2d(x, kernel, stride, padding):
    """torch.nn.AvgPool2d with count_include_pad=True (its default)."""
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    summed = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, kernel[0], kernel[1], 1),
        window_strides=(1, stride[0], stride[1], 1),
        padding=((0, 0), (padding[0], padding[0]),
                 (padding[1], padding[1]), (0, 0)),
    )
    return summed / (kernel[0] * kernel[1])


def global_avg_pool(x, keepdims=True):
    """torch.nn.AdaptiveAvgPool2d((1, 1))."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)
