"""Convolution / linear primitives, NHWC, with torch-compatible semantics.

Weight layout: HWIO, i.e. (kh, kw, in_ch / groups, out_ch) — XLA's native
layout. Checkpoint converters transpose torch's OIHW. Transposed convs are
stored pre-flipped as an equivalent HWIO kernel so the runtime op is a plain
input-dilated conv (see `fdn_tip2025_tpu/checkpoint/torch_import.py`).

Initializers replicate torch.nn defaults (kaiming-uniform a=sqrt(5) for
weights, uniform(-1/sqrt(fan_in), ..) for biases) so self-trained models match
the reference's initialization distribution (torch nn/modules/conv.py).
"""

import math
import os

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _conv_precision(dtype):
    """Conv operand precision policy (same as ops.precision's DFT policy):
    f32 inputs run the f32-exact bf16x6 dot algorithm — TPU convs
    otherwise silently round operands to a single bf16 pass (DEFAULT),
    which broke the f32 parity-mode claim — while bf16 serving keeps
    DEFAULT. FDN_CONV_FAST=1 opts f32 back into DEFAULT (speed over
    parity)."""
    if dtype not in (jnp.float32, jnp.float64):
        return None
    if os.environ.get("FDN_CONV_FAST") == "1":
        return None
    from fdn_tip2025_tpu.ops.precision import f32_dot_alg
    return f32_dot_alg()


def conv2d(x, w, b=None, stride=1, padding=0, groups=1, dilation=1,
           out_layout="NHWC"):
    """2-D conv matching torch.nn.Conv2d(stride, padding, dilation, groups).

    x: (B, H, W, Cin); w: (kh, kw, Cin // groups, Cout).
    `padding` is an int or (ph, pw) of symmetric zero padding.
    out_layout="NCHW" makes the conv WRITE channel-major output directly —
    the relayout rides the conv's output store instead of a separate
    transpose copy (used by the channel-major spectral pipeline).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", out_layout),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
        precision=_conv_precision(x.dtype),
    )
    if b is not None:
        y = y + (b.reshape(-1, 1, 1) if out_layout == "NCHW" else b)
    return y


def conv_transpose2d(x, w, b=None, stride=2, padding=1, kernel_size=None):
    """torch.nn.ConvTranspose2d(in, out, k, stride=s, padding=p) equivalent.

    Implemented as an input-dilated conv: out = conv(dilate(x, s), flip(w))
    with per-side padding k-1-p. `w` must already be in equivalent-HWIO,
    spatially flipped form: (kh, kw, Cin, Cout) — see torch_import.
    Output size: (H-1)*s - 2p + k.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    kh, kw = w.shape[0], w.shape[1]
    ph = kh - 1 - padding
    pw = kw - 1 - padding
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=[(ph, ph), (pw, pw)],
        lhs_dilation=stride,
        dimension_numbers=_DN,
        preferred_element_type=x.dtype,
        precision=_conv_precision(x.dtype),
    )
    if b is not None:
        y = y + b
    return y


def linear(x, w, b=None):
    """torch.nn.Linear; w: (in, out)."""
    y = jnp.matmul(x, w, precision=_conv_precision(x.dtype))
    if b is not None:
        y = y + b
    return y


# ---------------------------------------------------------------------------
# torch-default initializers
# ---------------------------------------------------------------------------

def _kaiming_uniform_bound(fan_in):
    # kaiming_uniform_(a=sqrt(5)): gain = sqrt(2/(1+5)) = 1/sqrt(3);
    # bound = gain * sqrt(3/fan_in) = 1/sqrt(fan_in)
    return 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0


def init_conv2d(key, kh, kw, cin, cout, groups=1, bias=True,
                dtype=jnp.float32):
    """Params dict {'weight': HWIO, 'bias': (cout,)} with torch Conv2d init."""
    kw_, kb_ = jax.random.split(key)
    fan_in = (cin // groups) * kh * kw
    bound = _kaiming_uniform_bound(fan_in)
    p = {"weight": jax.random.uniform(
        kw_, (kh, kw, cin // groups, cout), dtype, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(kb_, (cout,), dtype, -bound, bound)
    return p


def init_conv_transpose2d(key, kh, kw, cin, cout, bias=True,
                          dtype=jnp.float32):
    """ConvTranspose2d params in equivalent-HWIO (pre-flipped) form.

    torch init uses fan_in computed on the torch-layout weight (I, O, kh, kw):
    fan_in = O * kh * kw.
    """
    kw_, kb_ = jax.random.split(key)
    fan_in = cout * kh * kw
    bound = _kaiming_uniform_bound(fan_in)
    p = {"weight": jax.random.uniform(
        kw_, (kh, kw, cin, cout), dtype, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(kb_, (cout,), dtype, -bound, bound)
    return p


def init_linear(key, cin, cout, bias=True, dtype=jnp.float32):
    kw_, kb_ = jax.random.split(key)
    bound = _kaiming_uniform_bound(cin)
    p = {"weight": jax.random.uniform(kw_, (cin, cout), dtype, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(kb_, (cout,), dtype, -bound, bound)
    return p
