"""VGG19 perceptual loss.

Parity: reference basicsr/models/losses/losses.py:185-447
(VGGFeatureExtractor + PerceptualLoss). The reference hardcodes a local
VGG19 weight path (losses.py:185); here weights come from an explicit
torchvision-format vgg19 .pth (features.N.{weight,bias} keys) passed to
`load_vgg19_params`. Layer taps follow the NAMES['vgg19'] layout; the FDN
trainer uses {'conv1_2','conv2_2','conv3_4','conv4_4'} with l1 criterion,
perceptual_weight=0.01, use_input_norm=True, range_norm=True
(image_restoration_model.py:175-177).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from fdn_tip2025_tpu.ops import conv2d

# VGG19 'features' Sequential layout: (torch index, name, out_channels)
VGG19_LAYOUT = [
    (0, "conv1_1", 64), (2, "conv1_2", 64),
    (5, "conv2_1", 128), (7, "conv2_2", 128),
    (10, "conv3_1", 256), (12, "conv3_2", 256), (14, "conv3_3", 256),
    (16, "conv3_4", 256),
    (19, "conv4_1", 512), (21, "conv4_2", 512), (23, "conv4_3", 512),
    (25, "conv4_4", 512),
    (28, "conv5_1", 512), (30, "conv5_2", 512), (32, "conv5_3", 512),
    (34, "conv5_4", 512),
]
_POOL_AFTER = {"conv1_2", "conv2_2", "conv3_4", "conv4_4", "conv5_4"}

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_vgg19_params(path):
    """torchvision vgg19 state dict (.pth) -> {name: {weight, bias}}."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    params = {}
    for idx, name, _ in VGG19_LAYOUT:
        w = sd[f"features.{idx}.weight"].numpy().transpose(2, 3, 1, 0)
        b = sd[f"features.{idx}.bias"].numpy()
        params[name] = {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
    return params


def init_vgg19_params(key, scale=0.05):
    """Random VGG19 parameters in the load_vgg19_params layout.

    For exercising the perceptual-loss GRADIENT path (the full reference
    objective, image_restoration_model.py:477-491 / losses.py:764-774)
    when the pretrained torchvision weights are unavailable — the loss is
    differentiable through any conv stack, so random filters prove the
    plumbing end to end. `scale` keeps activations bounded through the
    16-conv cascade."""
    params = {}
    cin = 3
    for idx, name, cout in VGG19_LAYOUT:
        key, k = jax.random.split(key)
        params[name] = {
            "weight": jax.random.normal(k, (3, 3, cin, cout),
                                        jnp.float32) * scale,
            "bias": jnp.zeros((cout,), jnp.float32),
        }
        cin = cout
    return params


def _maxpool2(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        [(0, 0), (0, 0), (0, 0), (0, 0)])


def vgg19_features(params, x, layer_names, use_input_norm=True,
                   range_norm=False):
    """x: (B,H,W,3) RGB in [0,1] (or [-1,1] with range_norm). Returns
    {name: activation} for each requested tap (post-conv, pre-relu features
    like the reference extractor which names conv outputs)."""
    if range_norm:
        x = (x + 1.0) / 2.0
    if use_input_norm:
        x = (x - _MEAN) / _STD
    feats = {}
    wanted = set(layer_names)
    remaining = set(layer_names)
    for idx, name, _ in VGG19_LAYOUT:
        p = params[name]
        x = conv2d(x, p["weight"], p["bias"], padding=1)
        if name in wanted:
            feats[name] = x
            remaining.discard(name)
        if not remaining:
            break
        x = jax.nn.relu(x)
        if name in _POOL_AFTER:
            x = _maxpool2(x)
    return feats


def make_perceptual_loss(vgg_params,
                         layer_weights=None,
                         use_input_norm=True,
                         range_norm=True,
                         perceptual_weight=0.01,
                         criterion="l1"):
    """Build the FDN perceptual loss closure. Inputs in [0, 1]."""
    if layer_weights is None:
        layer_weights = {"conv1_2": 1.0, "conv2_2": 1.0,
                         "conv3_4": 1.0, "conv4_4": 1.0}
    names = tuple(layer_weights)
    err = (lambda a, b: jnp.mean(jnp.abs(a - b))) if criterion == "l1" \
        else (lambda a, b: jnp.mean((a - b) ** 2))

    def loss(pred, target):
        # range_norm=True in the reference maps [-1,1]->[0,1]; the trainer
        # feeds [0,1] images, which the reference then squashes the same way
        # on both args — keep identical behavior.
        fp = vgg19_features(vgg_params, pred, names, use_input_norm,
                            range_norm)
        ft = vgg19_features(vgg_params, target, names, use_input_norm,
                            range_norm)
        total = 0.0
        for n, w in layer_weights.items():
            total = total + w * err(fp[n], ft[n])
        return total * perceptual_weight

    return loss
