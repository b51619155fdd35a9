"""InceptionV3 pool-feature extractor for FID.

Parity target: the reference computes FID via pyiqa (fid.py:12-18), which
wraps the standard InceptionV3 2048-d pool3 features. No inception weights
ship in this zero-egress image, so this module implements the torchvision
`inception_v3` graph (BasicConv2d = conv bias-free + BN eps=1e-3;
Inception A/B/C/D/E blocks; final global average pool) in JAX/NHWC,
loading a user-supplied torchvision state dict — the same
weights-are-explicit protocol as metrics.lpips.

Input protocol follows pytorch-fid/pyiqa: images in [0,1], resized to
299x299 by the caller (metrics.fid.calculate_fid_folders), scaled to
[-1,1] here. Note: pytorch-fid's FID-specific weights also patch the
pool branches to count_include_pad=False; with plain torchvision weights
the torchvision semantics implemented here are the consistent choice.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from fdn_tip2025_tpu.ops import conv2d


def _pool(x, kind, k=3, stride=1, pad=0):
    dims = (1, k, k, 1)
    strides = (1, stride, stride, 1)
    pads = [(0, 0), (pad, pad), (pad, pad), (0, 0)]
    if kind == "max":
        return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, pads)
    # torch F.avg_pool2d default count_include_pad=True: divide by k*k
    s = lax.reduce_window(x, 0.0, lax.add, dims, strides, pads)
    return s / float(k * k)


def _bconv(p, x, stride=1, pad=0):
    """BasicConv2d: bias-free conv + BatchNorm(eps=0.001) + relu."""
    if isinstance(pad, tuple):
        x = jnp.pad(x, ((0, 0), (pad[0], pad[0]), (pad[1], pad[1]), (0, 0)))
        pad = 0
    x = conv2d(x, p["conv"], None, stride=stride, padding=pad)
    bn = p["bn"]
    inv = 1.0 / jnp.sqrt(bn["running_var"] + 1e-3)
    return jax.nn.relu((x - bn["running_mean"]) * inv * bn["weight"]
                       + bn["bias"])


def _inception_a(p, x):
    b1 = _bconv(p["branch1x1"], x)
    b5 = _bconv(p["branch5x5_2"], _bconv(p["branch5x5_1"], x), pad=2)
    b3 = _bconv(p["branch3x3dbl_1"], x)
    b3 = _bconv(p["branch3x3dbl_2"], b3, pad=1)
    b3 = _bconv(p["branch3x3dbl_3"], b3, pad=1)
    bp = _bconv(p["branch_pool"], _pool(x, "avg", 3, 1, 1))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _bconv(p["branch3x3"], x, stride=2)
    bd = _bconv(p["branch3x3dbl_1"], x)
    bd = _bconv(p["branch3x3dbl_2"], bd, pad=1)
    bd = _bconv(p["branch3x3dbl_3"], bd, stride=2)
    bp = _pool(x, "max", 3, 2, 0)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, x):
    b1 = _bconv(p["branch1x1"], x)
    b7 = _bconv(p["branch7x7_1"], x)
    b7 = _bconv(p["branch7x7_2"], b7, pad=(0, 3))
    b7 = _bconv(p["branch7x7_3"], b7, pad=(3, 0))
    bd = _bconv(p["branch7x7dbl_1"], x)
    bd = _bconv(p["branch7x7dbl_2"], bd, pad=(3, 0))
    bd = _bconv(p["branch7x7dbl_3"], bd, pad=(0, 3))
    bd = _bconv(p["branch7x7dbl_4"], bd, pad=(3, 0))
    bd = _bconv(p["branch7x7dbl_5"], bd, pad=(0, 3))
    bp = _bconv(p["branch_pool"], _pool(x, "avg", 3, 1, 1))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _bconv(p["branch3x3_2"], _bconv(p["branch3x3_1"], x), stride=2)
    b7 = _bconv(p["branch7x7x3_1"], x)
    b7 = _bconv(p["branch7x7x3_2"], b7, pad=(0, 3))
    b7 = _bconv(p["branch7x7x3_3"], b7, pad=(3, 0))
    b7 = _bconv(p["branch7x7x3_4"], b7, stride=2)
    bp = _pool(x, "max", 3, 2, 0)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, x):
    b1 = _bconv(p["branch1x1"], x)
    b3 = _bconv(p["branch3x3_1"], x)
    b3 = jnp.concatenate([_bconv(p["branch3x3_2a"], b3, pad=(0, 1)),
                          _bconv(p["branch3x3_2b"], b3, pad=(1, 0))],
                         axis=-1)
    bd = _bconv(p["branch3x3dbl_1"], x)
    bd = _bconv(p["branch3x3dbl_2"], bd, pad=1)
    bd = jnp.concatenate([_bconv(p["branch3x3dbl_3a"], bd, pad=(0, 1)),
                          _bconv(p["branch3x3dbl_3b"], bd, pad=(1, 0))],
                         axis=-1)
    bp = _bconv(p["branch_pool"], _pool(x, "avg", 3, 1, 1))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_features(params, x, normalize_input=True):
    """x: (B,H,W,3) RGB float [0,1] (299x299 canonical). Returns the
    2048-d global-average-pool features (torchvision inception_v3 graph,
    eval mode, no aux head)."""
    if normalize_input:
        x = 2.0 * x - 1.0  # pytorch-fid convention
    x = _bconv(params["Conv2d_1a_3x3"], x, stride=2)
    x = _bconv(params["Conv2d_2a_3x3"], x)
    x = _bconv(params["Conv2d_2b_3x3"], x, pad=1)
    x = _pool(x, "max", 3, 2, 0)
    x = _bconv(params["Conv2d_3b_1x1"], x)
    x = _bconv(params["Conv2d_4a_3x3"], x)
    x = _pool(x, "max", 3, 2, 0)
    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _inception_a(params[name], x)
    x = _inception_b(params["Mixed_6a"], x)
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(params[name], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x)
    x = _inception_e(params["Mixed_7c"], x)
    return jnp.mean(x, axis=(1, 2))


def convert_inception_state_dict(sd):
    """torchvision inception_v3 state dict (tensors or numpy) -> nested
    param tree for inception_features. Ignores AuxLogits/fc."""
    params = {}
    for key, val in sd.items():
        if key.startswith(("AuxLogits", "fc")):
            continue
        a = np.asarray(val.numpy() if hasattr(val, "numpy") else val)
        parts = key.split(".")  # e.g. Mixed_5b.branch1x1.conv.weight
        node = params
        for part in parts[:-2]:
            node = node.setdefault(part, {})
        leaf, attr = parts[-2], parts[-1]
        if leaf == "conv" and attr == "weight":
            node["conv"] = jnp.asarray(a.transpose(2, 3, 1, 0))  # ->HWIO
        elif leaf == "bn" and attr != "num_batches_tracked":
            node.setdefault("bn", {})[attr] = jnp.asarray(a)
    return params


def load_inception_feature_fn(pth_path, normalize_input=True):
    """torchvision inception_v3 .pth -> jitted (N,299,299,3)->(N,2048)."""
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    params = convert_inception_state_dict(sd)
    fwd = jax.jit(lambda x: inception_features(params, x, normalize_input))

    def feature_fn(imgs):
        return np.asarray(fwd(jnp.asarray(imgs, jnp.float32)))

    return feature_fn
