"""LPIPS (Learned Perceptual Image Patch Similarity), VGG16 backbone.

Parity: the reference gates on pyiqa's LPIPS (m.py:72) and ships a
standalone scripts/metrics/calculate_lpips.py using lpips-VGG with
normalize=True ([0,1] inputs scaled to [-1,1]). Neither pyiqa, lpips, nor
any pretrained weights are installable in this zero-egress image, so this
module implements the exact LPIPS-VGG computation with weights loaded
from user-supplied .pth files:
  * torchvision vgg16 state dict (features.N.{weight,bias})
  * lpips linear-head state dict (lin{0..4}.model.1.weight)

score = sum_l mean_hw( w_l . (norm(f_l(x)) - norm(f_l(y)))^2 )
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from fdn_tip2025_tpu.ops import conv2d

# VGG16 'features' conv indices per slice (pre-pool taps relu1_2, relu2_2,
# relu3_3, relu4_3, relu5_3 — the standard LPIPS taps).
VGG16_SLICES = [
    [(0, 64), (2, 64)],
    [(5, 128), (7, 128)],
    [(10, 256), (12, 256), (14, 256)],
    [(17, 512), (19, 512), (21, 512)],
    [(24, 512), (26, 512), (28, 512)],
]

# LPIPS input normalization (the 'scaling layer')
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_lpips_params(vgg16_path, lin_path):
    """Build param dict from torchvision vgg16 + lpips linear .pth files."""
    import torch

    vgg_sd = torch.load(vgg16_path, map_location="cpu", weights_only=True)
    lin_sd = torch.load(lin_path, map_location="cpu", weights_only=True)
    convs = []
    for sl in VGG16_SLICES:
        convs.append([
            {"weight": jnp.asarray(
                vgg_sd[f"features.{i}.weight"].numpy().transpose(
                    2, 3, 1, 0)),
             "bias": jnp.asarray(vgg_sd[f"features.{i}.bias"].numpy())}
            for i, _ in sl])
    lins = []
    for i in range(5):
        for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if k in lin_sd:
                lins.append(jnp.asarray(
                    lin_sd[k].numpy()[:, :, 0, 0].reshape(-1)))
                break
        else:
            raise KeyError(f"lpips linear head {i} not found")
    return {"convs": convs, "lins": lins}


def _maxpool2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1),
                             [(0, 0), (0, 0), (0, 0), (0, 0)])


def _features(params, x):
    """x in [-1, 1], NHWC. Returns the 5 tapped activations."""
    x = (x - _SHIFT) / _SCALE
    feats = []
    for si, convs in enumerate(params["convs"]):
        if si > 0:
            x = _maxpool2(x)
        for c in convs:
            x = jax.nn.relu(conv2d(x, c["weight"], c["bias"], padding=1))
        feats.append(x)
    return feats


def lpips(params, x, y, normalize=True):
    """x, y: (B,H,W,3) RGB. normalize=True maps [0,1] -> [-1,1] (the
    reference's calculate_lpips.py:28-46 convention)."""
    if normalize:
        x = 2.0 * x - 1.0
        y = 2.0 * y - 1.0
    fx = _features(params, x)
    fy = _features(params, y)
    total = 0.0
    for f1, f2, w in zip(fx, fy, params["lins"]):
        # lpips.normalize_tensor convention: x / (||x||_c + eps)
        n1 = f1 / (jnp.sqrt(jnp.sum(f1 * f1, -1, keepdims=True)) + 1e-10)
        n2 = f2 / (jnp.sqrt(jnp.sum(f2 * f2, -1, keepdims=True)) + 1e-10)
        d = (n1 - n2) ** 2
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total
