"""BasicSR arch helpers (reference basicsr/models/archs/arch_util.py).

Mostly unused by FDN itself but part of the framework surface:
ResidualBlockNoBN (:78-109), make_layer (:68-75), default_init_weights
(:19-39, kaiming + scale), flow_warp (:112-147, bilinear grid sample),
resize_flow (:150-178), pixel(_un)shuffle (ops.resize).
"""

import math

import numpy as np

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.ops import conv2d, init_conv2d, interp_bilinear


def default_init_weights(params, scale=1.0):
    """Scale conv/linear weights in a param tree (reference applies
    kaiming then scales; our init_* are already torch-default kaiming,
    so this just rescales weights, biases untouched)."""
    def walk(t):
        out = {}
        for k, v in t.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k == "weight":
                out[k] = v * scale
            else:
                out[k] = v
        return out

    return walk(params)


def init_residual_block_no_bn(key, num_feat=64):
    k1, k2 = jax.random.split(key)
    return {"conv1": init_conv2d(k1, 3, 3, num_feat, num_feat),
            "conv2": init_conv2d(k2, 3, 3, num_feat, num_feat)}


def residual_block_no_bn(params, x, res_scale=1.0):
    y = jax.nn.relu(conv2d(x, params["conv1"]["weight"],
                           params["conv1"]["bias"], padding=1))
    y = conv2d(y, params["conv2"]["weight"], params["conv2"]["bias"],
               padding=1)
    return x + y * res_scale


def make_layer(init_fn, apply_fn, key, num_blocks, **kwargs):
    """Stack `num_blocks` identical blocks (reference make_layer)."""
    keys = jax.random.split(key, num_blocks)
    params = {str(i): init_fn(keys[i], **kwargs) for i in range(num_blocks)}

    def apply(p, x, **kw):
        for i in range(num_blocks):
            x = apply_fn(p[str(i)], x, **kw)
        return x

    return params, apply


def grid_sample_bilinear(x, grid_x, grid_y, padding_mode="zeros"):
    """Bilinear sampling of x (B,H,W,C) at absolute pixel coords."""
    b, h, w, c = x.shape
    x0 = jnp.floor(grid_x)
    y0 = jnp.floor(grid_y)
    wx = (grid_x - x0)[..., None]
    wy = (grid_y - y0)[..., None]

    def gather(yy, xx):
        valid = ((xx >= 0) & (xx <= w - 1) & (yy >= 0) &
                 (yy <= h - 1))[..., None]
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        batch_idx = jnp.arange(b)[:, None, None]
        vals = x[batch_idx, yi, xi]
        if padding_mode == "zeros":
            vals = jnp.where(valid, vals, 0.0)
        return vals

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def flow_warp(x, flow, padding_mode="zeros"):
    """Warp x (B,H,W,C) by optical flow (B,H,W,2) (reference flow_warp,
    align_corners=True semantics on absolute coordinates)."""
    b, h, w, _ = flow.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype),
                          jnp.arange(w, dtype=flow.dtype), indexing="ij")
    sample_x = gx[None] + flow[..., 0]
    sample_y = gy[None] + flow[..., 1]
    return grid_sample_bilinear(x, sample_x, sample_y, padding_mode)


def resize_flow(flow, size_type, sizes):
    """Resize a flow field and rescale its values (reference resize_flow)."""
    b, h, w, _ = flow.shape
    if size_type == "ratio":
        oh, ow = int(h * sizes[0]), int(w * sizes[1])
    else:
        oh, ow = sizes
    scale_h, scale_w = oh / h, ow / w
    out = interp_bilinear(flow, size=(oh, ow))
    return out * jnp.asarray([scale_w, scale_h], flow.dtype)
