"""Training losses.

Parity: reference basicsr/models/losses/losses.py — L1Loss (:26-53),
FFTLoss (:83-115), MSELoss (:118-), PSNRLoss, CharbonnierLoss, EdgeLoss
(Laplacian pyramid), PerceptualLoss/VGGFeatureExtractor (:185-447),
MARLoss (:764-774) — plus the exposure-style legacy losses used by the
ratio/gamma trainers. All are pure functions over NHWC jnp arrays,
differentiable under jit/grad.
"""

import math
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.ops import rfft2, conv2d, interp_bilinear, grayscale
from fdn_tip2025_tpu.ops.resize import avg_pool2d


def _reduce(x, reduction):
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


def l1_loss(pred, target, weight=None, loss_weight=1.0, reduction="mean"):
    e = jnp.abs(pred - target)
    if weight is not None:
        e = e * weight
    return loss_weight * _reduce(e, reduction)


def mse_loss(pred, target, weight=None, loss_weight=1.0, reduction="mean"):
    e = (pred - target) ** 2
    if weight is not None:
        e = e * weight
    return loss_weight * _reduce(e, reduction)


def charbonnier_loss(pred, target, eps=1e-12, loss_weight=1.0,
                     reduction="mean"):
    return loss_weight * _reduce(jnp.sqrt((pred - target) ** 2 + eps),
                                 reduction)


def psnr_loss(pred, target, loss_weight=1.0, to_y=False):
    """Reference PSNRLoss: loss_weight * log10(mse) / 10 * scale."""
    if to_y:
        coef = jnp.asarray([65.481, 128.553, 24.966]) / 255.0
        pred = jnp.sum(pred * coef, axis=-1, keepdims=True) + 16.0 / 255.0
        target = jnp.sum(target * coef, axis=-1, keepdims=True) + 16.0 / 255.0
    mse = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    scale = 10 / math.log(10)
    return loss_weight * scale * jnp.mean(jnp.log(mse + 1e-8))


def fft_loss(pred, target, weight=None, loss_weight=1.0, reduction="mean"):
    """L1 over stacked (real, imag) of rfft2, norm='backward'
    (losses.py:83-115)."""
    pf = rfft2(pred)
    tf = rfft2(target)
    ps = jnp.stack([pf.real, pf.imag], axis=-1)
    ts = jnp.stack([tf.real, tf.imag], axis=-1)
    e = jnp.abs(ps - ts)
    if weight is not None:
        e = e * weight[..., None]
    return loss_weight * _reduce(e, reduction)


@lru_cache(maxsize=None)
def _edge_kernel():
    k = np.array([[0.05, 0.25, 0.4, 0.25, 0.05]])
    w = (k.T @ k).astype(np.float32)
    return jnp.asarray(w)[:, :, None, None]  # HWIO depthwise (5,5,1,1)


def _gauss_conv(img):
    w = jnp.tile(_edge_kernel(), (1, 1, 1, img.shape[-1]))
    img = jnp.pad(img, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
    return conv2d(img, w, None, groups=img.shape[-1])


def edge_loss(pred, target, loss_weight=1.0):
    """Laplacian-pyramid edge loss (losses.py:56-80 EdgeLoss1)."""
    def lap(x):
        filtered = _gauss_conv(x)
        down = filtered[:, ::2, ::2, :]
        up = jnp.zeros_like(filtered)
        up = up.at[:, ::2, ::2, :].set(down * 4)
        return x - _gauss_conv(up)

    return loss_weight * jnp.mean(jnp.abs(lap(pred) - lap(target)))


def mar_loss(pred, target, vgg_loss=None, scale=1.0, vgg_weight=10.0,
             amp_weight=0.01):
    """MARLoss (losses.py:764-774): MSE + 10*VGG + 0.01*MSE(|rfft|).

    `pred` is the MAR output at `scale`; `target` is full-res GT, bilinearly
    downscaled here (align_corners=False) like the reference's nn.Upsample.
    """
    t = target if scale == 1.0 else interp_bilinear(target, scale)
    out = mse_loss(pred, t)
    if vgg_loss is not None:
        out = out + vgg_weight * vgg_loss(pred, t)
    pa = jnp.abs(rfft2(pred))
    ta = jnp.abs(rfft2(t))
    return out + amp_weight * mse_loss(pa, ta)


def exposure_loss(pred, target, patch_size=16):
    """L_exp-style pooled-exposure loss (losses.py L_exp_gai family):
    MSE between mean-pooled gray patches."""
    pg = avg_pool2d(grayscale(pred), patch_size, patch_size, 0)
    tg = avg_pool2d(grayscale(target), patch_size, patch_size, 0)
    return jnp.mean((pg - tg) ** 2)


def gamma_loss(pred, target):
    """gamma_loss (losses.py:753-763): exposure at 1/8 + 1/16 downsample."""
    def at_scale(s):
        return jnp.mean((interp_bilinear(grayscale(pred), s)
                         - interp_bilinear(grayscale(target), s)) ** 2)

    return at_scale(1 / 8) + at_scale(1 / 16)


def tv_loss(x, loss_weight=1.0):
    """L_TV total-variation smoothness (losses.py L_TV)."""
    h = jnp.mean((x[:, 1:] - x[:, :-1]) ** 2)
    w = jnp.mean((x[:, :, 1:] - x[:, :, :-1]) ** 2)
    return loss_weight * (h + w)


def spa_loss(pred, target, pool=4):
    """L_spa (losses.py Zero-DCE spatial-consistency loss): preserve local
    gradients of mean-pooled luminance between enhanced and original."""
    pg = avg_pool2d(jnp.mean(pred, -1, keepdims=True), pool, pool, 0)
    tg = avg_pool2d(jnp.mean(target, -1, keepdims=True), pool, pool, 0)

    def grads(z):
        return (z[:, 1:, :-1] - z[:, :-1, :-1],
                z[:, :-1, 1:] - z[:, :-1, :-1])

    pdy, pdx = grads(pg)
    tdy, tdx = grads(tg)
    return jnp.mean((pdy - tdy) ** 2 + (pdx - tdx) ** 2)


def color_loss(pred):
    """Sa_Loss / color-constancy style: penalize channel-mean imbalance."""
    mean_rgb = jnp.mean(pred, axis=(1, 2))
    r, g, b = mean_rgb[:, 0], mean_rgb[:, 1], mean_rgb[:, 2]
    return jnp.mean((r - g) ** 2 + (r - b) ** 2 + (g - b) ** 2)


LOSS_REGISTRY = {
    "L1Loss": l1_loss,
    "MSELoss": mse_loss,
    "FFTLoss": fft_loss,
    "PSNRLoss": psnr_loss,
    "CharbonnierLoss": charbonnier_loss,
    "EdgeLoss": edge_loss,
}


def build_loss(opt):
    """opt: {'type': 'L1Loss', 'loss_weight': 1.0, 'reduction': 'mean'}."""
    opt = dict(opt)
    fn = LOSS_REGISTRY[opt.pop("type")]
    kwargs = opt

    def wrapped(pred, target, weight=None):
        return fn(pred, target, weight=weight, **kwargs) \
            if "reduction" in kwargs or "loss_weight" in kwargs \
            else fn(pred, target, **kwargs)

    return wrapped
