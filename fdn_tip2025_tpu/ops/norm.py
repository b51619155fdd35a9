"""Normalization primitives (NHWC).

Channel LayerNorm matches the reference's Restormer-style LayerNorm
(FDN_arch.py:288-342): statistics over the channel axis only, biased
variance, eps 1e-5. In NHWC this is simply a reduction over the last axis —
no to_3d/to_4d rearrange needed (that dance exists only because the
reference is NCHW).
"""

import jax.numpy as jnp


def layer_norm_2d(x, weight, bias=None, eps=1e-5):
    """Per-pixel channel LayerNorm.

    bias=None  -> BiasFree variant (no mean subtraction, FDN_arch.py:296-310).
    bias given -> WithBias variant (FDN_arch.py:313-329).
    """
    # statistics accumulate in f32 even for bf16 activations (the
    # mean/var cancellation loses too much in 8-bit mantissas)
    xs = x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
    if bias is None:
        var = jnp.var(xs, axis=-1, keepdims=True).astype(x.dtype)
        return x / jnp.sqrt(var + eps) * weight
    mu = jnp.mean(xs, axis=-1, keepdims=True)
    var = jnp.var(xs, axis=-1, keepdims=True)
    inv = (1.0 / jnp.sqrt(var + eps)).astype(x.dtype)
    return (x - mu.astype(x.dtype)) * inv * weight + bias


def init_layer_norm(dim, bias=True, dtype=jnp.float32):
    p = {"weight": jnp.ones((dim,), dtype)}
    if bias:
        p["bias"] = jnp.zeros((dim,), dtype)
    return p


def layer_norm_cm(x, weight, bias=None, eps=1e-5):
    """Channel LayerNorm for channel-MAJOR tensors (C, ...).

    Same semantics as :func:`layer_norm_2d` (biased variance, eps 1e-5,
    f32 statistics for bf16 activations) with the channel axis leading —
    used by the dense channel-major spectral pipeline (ops.fourier
    to_patches_cm and friends).
    """
    xs = x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
    bshape = (-1,) + (1,) * (x.ndim - 1)
    w = weight.reshape(bshape)
    if bias is None:
        var = jnp.var(xs, axis=0, keepdims=True).astype(x.dtype)
        return x / jnp.sqrt(var + eps) * w
    mu = jnp.mean(xs, axis=0, keepdims=True)
    var = jnp.var(xs, axis=0, keepdims=True)
    inv = (1.0 / jnp.sqrt(var + eps)).astype(x.dtype)
    return (x - mu.astype(x.dtype)) * inv * w + bias.reshape(bshape)


def layer_norm_nchw(x, weight, bias=None, eps=1e-5):
    """Channel LayerNorm for NCHW tensors (B, C, H, W), channel axis 1.

    Same semantics as :func:`layer_norm_2d` / :func:`layer_norm_cm`
    (biased variance, eps 1e-5, f32 statistics for bf16 activations) —
    the norm of the channel-major block pipeline (nn/cm_block.py), where
    H/W stay dense in the minor dims and the reduction runs over the
    second-major axis.
    """
    xs = x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
    bshape = (1, -1) + (1,) * (x.ndim - 2)
    w = weight.reshape(bshape)
    if bias is None:
        var = jnp.var(xs, axis=1, keepdims=True).astype(x.dtype)
        return x / jnp.sqrt(var + eps) * w
    mu = jnp.mean(xs, axis=1, keepdims=True)
    var = jnp.var(xs, axis=1, keepdims=True)
    inv = (1.0 / jnp.sqrt(var + eps)).astype(x.dtype)
    return (x - mu.astype(x.dtype)) * inv * w + bias.reshape(bshape)


def batch_norm_inference(x, weight, bias, running_mean, running_var, eps=1e-5):
    """torch.nn.BatchNorm2d in eval mode (running statistics)."""
    inv = weight / jnp.sqrt(running_var + eps)
    return x * inv + (bias - running_mean * inv)
