"""MAR-side building blocks.

Parity targets (reference /root/reference/basicsr/models/archs/FDN_arch.py):
BasicConv :16-32, AFF :37-47, FAM :52-61, SpaBlock :62-72, FreBlock :75-100,
ProcessBlock :101-118 (and the overriding lolv1 variant,
fdnlol24_arch.py:761-777), fourier_fuse :121-148.
"""

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.ops import (
    conv2d, conv_transpose2d, init_conv2d, init_conv_transpose2d,
    rfft2, irfft2, leaky_relu,
)
from fdn_tip2025_tpu.ops.fourier import (
    amp_phase, polar, amp_phase_ri, polar_ri, rfft2_ri, irfft2_ri,
)
from fdn_tip2025_tpu.ops.context import bf16_spectra_enabled


def _split(key, n):
    return jax.random.split(key, n)


# -- BasicConv: conv (or transposed conv) + optional LeakyReLU(0.1) ----------

def init_basic_conv(key, cin, cout, kernel_size, stride=1, bias=True,
                    relu=True, transpose=False):
    if transpose:
        p = {"0": init_conv_transpose2d(key, kernel_size, kernel_size,
                                        cin, cout, bias=bias)}
    else:
        p = {"0": init_conv2d(key, kernel_size, kernel_size, cin, cout,
                              bias=bias)}
    meta = {"k": kernel_size, "stride": stride, "relu": relu,
            "transpose": transpose}
    return {"main": p}, meta


def basic_conv(params, x, k, stride=1, relu=True, transpose=False):
    c = params["main"]["0"]
    if transpose:
        y = conv_transpose2d(x, c["weight"], c.get("bias"), stride=stride,
                             padding=k // 2 - 1)
    else:
        y = conv2d(x, c["weight"], c.get("bias"), stride=stride,
                   padding=k // 2)
    return leaky_relu(y) if relu else y


# -- AFF: concat 3 scales -> 1x1+leaky -> 3x3 --------------------------------

def init_aff(key, cin, cout):
    k1, k2 = _split(key, 2)
    p1, _ = init_basic_conv(k1, cin, cout, 1)
    p2, _ = init_basic_conv(k2, cout, cout, 3, relu=False)
    return {"conv": {"0": p1, "1": p2}}


def aff(params, x1, x2, x4):
    x = jnp.concatenate([x1, x2, x4], axis=-1)
    x = basic_conv(params["conv"]["0"], x, 1)
    return basic_conv(params["conv"]["1"], x, 3, relu=False)


# -- FAM: concat 2 -> 1x1 -> 3x3 ---------------------------------------------

def init_fam(key, channel):
    k1, k2 = _split(key, 2)
    return {
        "merge1": init_conv2d(k1, 1, 1, channel * 2, channel),
        "merge2": init_conv2d(k2, 3, 3, channel, channel),
    }


def fam(params, x1, x2):
    out = jnp.concatenate([x1, x2], axis=-1)
    out = conv2d(out, params["merge1"]["weight"], params["merge1"]["bias"])
    return conv2d(out, params["merge2"]["weight"], params["merge2"]["bias"],
                  padding=1)


# -- SpaBlock: residual 2x (conv3x3 + leaky) ---------------------------------

def init_spa_block(key, nc):
    k1, k2 = _split(key, 2)
    return {"block": {"0": init_conv2d(k1, 3, 3, nc, nc),
                      "2": init_conv2d(k2, 3, 3, nc, nc)}}


def spa_block(params, x):
    y = leaky_relu(conv2d(x, params["block"]["0"]["weight"],
                          params["block"]["0"]["bias"], padding=1))
    y = leaky_relu(conv2d(y, params["block"]["2"]["weight"],
                          params["block"]["2"]["bias"], padding=1))
    return x + y


# -- FreBlock: full-image rFFT amp/phase 1x1-conv processing + residual ------

def init_fre_block(key, nc):
    k1, k2, k3, k4, k5 = _split(key, 5)
    return {
        "fpre": init_conv2d(k1, 1, 1, nc, nc),
        "process1": {"0": init_conv2d(k2, 1, 1, nc, nc),
                     "2": init_conv2d(k3, 1, 1, nc, nc)},
        "process2": {"0": init_conv2d(k4, 1, 1, nc, nc),
                     "2": init_conv2d(k5, 1, 1, nc, nc)},
    }


def _seq_1x1_leaky_1x1(p, x):
    x = leaky_relu(conv2d(x, p["0"]["weight"], p["0"]["bias"]))
    return conv2d(x, p["2"]["weight"], p["2"]["bias"])


def fre_block(params, x):
    h, w = x.shape[1], x.shape[2]
    y = conv2d(x, params["fpre"]["weight"], params["fpre"]["bias"])
    if x.dtype == jnp.bfloat16 and bf16_spectra_enabled():
        # bf16 spectral segment end to end (VERDICT-r2 #1a): the f32
        # path below already rounds its DFT matmul operands to bf16 in
        # serving (fast=True), so keeping the STORED spectra/amp/phase
        # bf16 halves this segment's HBM bytes at the same operand
        # precision. f32/parity traces take the unchanged complex path;
        # AMP TRAINING disables this via ops.context.f32_spectra (torch
        # autocast keeps FFTs f32 — the convergence gates pin that).
        re, im = rfft2_ri(y)
        mag, pha = amp_phase_ri(re, im)
        mag = _seq_1x1_leaky_1x1(params["process1"], mag)
        pha = _seq_1x1_leaky_1x1(params["process2"], pha)
        rr, ii = polar_ri(mag, pha)
        return irfft2_ri(rr, ii, s=(h, w)) + x
    mag, pha = amp_phase(rfft2(y))
    mag = _seq_1x1_leaky_1x1(params["process1"], mag.astype(x.dtype))
    pha = _seq_1x1_leaky_1x1(params["process2"], pha.astype(x.dtype))
    # bf16 inputs here = AMP training with f32 spectra: keep the round-2
    # fast inverse (operand rounding), f32 keeps the exact one.
    out = irfft2(polar(mag.astype(jnp.float32), pha.astype(jnp.float32)),
                 s=(h, w), fast=x.dtype == jnp.bfloat16).astype(x.dtype)
    return out + x


# -- ProcessBlock ------------------------------------------------------------

def init_process_block(key, in_nc, spatial=False):
    k1, k2, k3 = _split(key, 3)
    p = {"frequency_process": init_fre_block(k1, in_nc),
         "cat": init_conv2d(k2, 1, 1, 2 * in_nc if spatial else in_nc,
                            in_nc)}
    if spatial:
        p["spatial_process"] = init_spa_block(k3, in_nc)
    return p


def process_block(params, x, spatial=False, variant="fdn"):
    """variant='fdn': non-spatial path is freq(x) + x (cat conv unused,
    FDN_arch.py:109-118). variant='lolv1': the later ProcessBlock definition
    shadows the first one in fdnlol24_arch.py (classes resolve at
    instantiation), so the non-spatial path applies the cat conv:
    cat(freq(x)) + x (fdnlol24_arch.py:761-777)."""
    x_freq = fre_block(params["frequency_process"], x)
    if spatial:
        x_spa = spa_block(params["spatial_process"], x)
        xcat = jnp.concatenate([x_spa, x_freq], axis=-1)
        return conv2d(xcat, params["cat"]["weight"],
                      params["cat"]["bias"]) + x
    if variant == "lolv1":
        return conv2d(x_freq, params["cat"]["weight"],
                      params["cat"]["bias"]) + x
    return x_freq + x


# -- fourier_fuse: 3-scale concat -> (1x1, then 1x1 depthwise with pad 1!)
#    -> amp/phase processing at (H+2, W+2) -> irfft cropped to (H, W) -> 3x3

def init_fourier_fuse(key, in_nc, out_nc):
    k1, k2, k3, k4, k5, k6, k7 = _split(key, 7)
    return {
        "fpre": {"0": init_conv2d(k1, 1, 1, in_nc, out_nc),
                 "1": init_conv2d(k2, 1, 1, out_nc, out_nc, groups=out_nc)},
        "process1": {"0": init_conv2d(k3, 1, 1, out_nc, out_nc),
                     "2": init_conv2d(k4, 1, 1, out_nc, out_nc)},
        "process2": {"0": init_conv2d(k5, 1, 1, out_nc, out_nc),
                     "2": init_conv2d(k6, 1, 1, out_nc, out_nc)},
        "fourier_out": init_conv2d(k7, 3, 3, out_nc, out_nc),
    }


def fourier_fuse(params, x1, x2, x4):
    x = jnp.concatenate([x1, x2, x4], axis=-1)
    h, w = x.shape[1], x.shape[2]
    out_nc = params["fpre"]["1"]["weight"].shape[-1]
    y = conv2d(x, params["fpre"]["0"]["weight"], params["fpre"]["0"]["bias"])
    # The reference's Conv2d(out, out, 1, 1, padding=1, groups=out) grows the
    # map to (H+2, W+2) with bias-valued borders (FDN_arch.py:125-126).
    y = conv2d(y, params["fpre"]["1"]["weight"], params["fpre"]["1"]["bias"],
               padding=1, groups=out_nc)
    if x.dtype == jnp.bfloat16 and bf16_spectra_enabled():
        # bf16 spectral segment (same rationale as fre_block); irfft2_ri
        # with s=(H, W) crops the (H+2, W+2)-sized spectrum like torch.
        re, im = rfft2_ri(y)
        mag, pha = amp_phase_ri(re, im)
        mag = _seq_1x1_leaky_1x1(params["process1"], mag)
        pha = _seq_1x1_leaky_1x1(params["process2"], pha)
        rr, ii = polar_ri(mag, pha)
        out = irfft2_ri(rr, ii, s=(h, w))
        return conv2d(out, params["fourier_out"]["weight"],
                      params["fourier_out"]["bias"], padding=1)
    yf = rfft2(y)
    mag, pha = amp_phase(yf)
    mag = _seq_1x1_leaky_1x1(params["process1"], mag.astype(x.dtype))
    pha = _seq_1x1_leaky_1x1(params["process2"], pha.astype(x.dtype))
    # irfft2 with s=(H, W) crops the (H+2, W+2)-sized spectrum like torch.
    out = irfft2(polar(mag.astype(jnp.float32), pha.astype(jnp.float32)),
                 s=(h, w), fast=x.dtype == jnp.bfloat16).astype(x.dtype)
    return conv2d(out, params["fourier_out"]["weight"],
                  params["fourier_out"]["bias"], padding=1)
