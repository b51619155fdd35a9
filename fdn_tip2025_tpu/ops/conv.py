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


def _conv_mode(dtype):
    """Conv operand precision policy: 'x3' | 'highest' | 'fast'.

    Measured (benchmarks/conv_prec.py, v5e): XLA convolutions IGNORE
    DotAlgorithmPreset — X6 gives the same ~2e-3 bf16-operand error as
    DEFAULT on both dense and depthwise convs; only Precision.HIGHEST is
    f32-exact (1e-7). Full-forward cost of the exact options
    (1120x640): HIGHEST 0.363 MP/s; manual 3-term bf16 split 'x3'
    (x_hi*w_hi + x_lo*w_hi + x_hi*w_lo, ~3e-7 rel) 0.26 — XLA's
    internal 6-pass stencil beats three explicit convs, so 'highest' is
    the f32 default (parity mode) and 'x3' is kept for the record.
    'fast' (single bf16 pass, the reference's own cudnn-TF32 class of
    rounding) reaches 0.468. FDN_CONV_PREC overrides; FDN_CONV_FAST=1
    is legacy for 'fast'. bf16 serving always uses the DEFAULT pass;
    CPU is exact at DEFAULT already."""
    if dtype not in (jnp.float32, jnp.float64):
        return "fast"
    if os.environ.get("FDN_CONV_FAST") == "1":
        return "fast"
    if jax.default_backend() != "tpu":
        return "fast"  # CPU/GPU DEFAULT convs are already f32-exact
    mode = os.environ.get("FDN_CONV_PREC", "mixed")
    if mode not in ("x3", "highest", "high", "mixed", "fast"):
        raise ValueError(
            f"FDN_CONV_PREC={mode!r}: expected one of "
            "x3/highest/high/mixed/fast")
    return mode


def _bf16_split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _conv_x3(conv_fn, x, w):
    """3-term bf16-split convolution with f32 accumulation (see
    _conv_mode): conv_fn(x, w) must run a DEFAULT-precision conv with
    preferred_element_type=float32."""
    xh, xl = _bf16_split(x)
    wh, wl = _bf16_split(w)
    return conv_fn(xh, wh) + conv_fn(xl, wh) + conv_fn(xh, wl)


def _conv1x1_einsum(x, w, b):
    """1x1 conv as a channel einsum: dots DO respect the f32-exact X6
    algorithm (ops.precision), unlike convolutions — exact AND ~6x
    cheaper than a HIGHEST conv."""
    from fdn_tip2025_tpu.ops.precision import dot_precision
    y = jnp.einsum("bhwc,co->bhwo", x, w[0, 0],
                   precision=dot_precision(x.dtype))
    if b is not None:
        y = y + b
    return y


def _depthwise_stencil(x, w, b, padding, groups):
    """Depthwise 3x3 (or any kxk) conv as an explicit shift-FMA stencil.

    XLA convolutions round operands to bf16 in every mode except HIGHEST
    (a 6-pass stencil); the VPU needs no matmul for a per-channel
    stencil, so a single-pass f32 multiply-add chain is both EXACT and
    the cheapest formulation. Supports cout == m * groups (torch grouped
    semantics: output o belongs to group o // m).
    """
    kh, kw, _, cout = w.shape
    m = cout // groups
    b_, h, wd, cin = x.shape
    oh = h + 2 * padding[0] - kh + 1
    ow = wd + 2 * padding[1] - kw + 1
    xp = jnp.pad(x, ((0, 0), (padding[0], padding[0]),
                     (padding[1], padding[1]), (0, 0)))
    out = None
    for dy in range(kh):
        for dx in range(kw):
            t = lax.slice(xp, (0, dy, dx, 0), (b_, dy + oh, dx + ow, cin))
            if m == 1:
                term = t * w[dy, dx, 0]
            else:
                # (..., cin, 1) * (cin, m) -> (..., cin, m): group-major
                # channel order after the merge, matching torch
                term = t[..., None] * w[dy, dx, 0].reshape(cin, m)
            out = term if out is None else out + term
    if m != 1:
        out = out.reshape(b_, oh, ow, cout)
    if b is not None:
        out = out + b
    return out


def conv2d(x, w, b=None, stride=1, padding=0, groups=1, dilation=1,
           out_layout="NHWC"):
    """2-D conv matching torch.nn.Conv2d(stride, padding, dilation, groups).

    x: (B, H, W, Cin); w: (kh, kw, Cin // groups, Cout).
    `padding` is an int or (ph, pw) of symmetric zero padding.
    out_layout="NCHW" makes the conv WRITE channel-major output directly.

    f32 precision is governed by _conv_mode (default: 3-term bf16-split,
    ~1e-5 rel error). FDN_CONV_DISPATCH=1 additionally enables the
    experimental 1x1-einsum / depthwise-stencil fast paths — measured
    SLOWER on the full forward (0.274 vs 0.363 MP/s with HIGHEST convs;
    the stencil materializes its pad and the einsum breaks XLA's conv
    fusions inside the scanned blocks), kept for re-measurement.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    mode = _conv_mode(x.dtype)
    # XLA's CPU grouped-conv path is ~80x slower than an explicit
    # shift-FMA stencil (measured 6.7 vs 0.08 ms at 32x32x64) — use the
    # stencil for depthwise convs on non-TPU backends. Exact numerics
    # (single-pass f32 FMA chain). FDN_CPU_DW_STENCIL=0 opts out.
    if jax.default_backend() != "tpu" and groups > 1 \
            and groups == x.shape[-1] and w.shape[2] == 1 \
            and stride == (1, 1) and dilation == (1, 1) \
            and out_layout == "NHWC" \
            and os.environ.get("FDN_CPU_DW_STENCIL") != "0":
        return _depthwise_stencil(x, w, b, padding, groups)
    # Round-3 A/B lever: depthwise convs as shift-FMA stencils ON TPU.
    # The byte audit (benchmarks/artifacts/byte_audit_bf16_r3.json) puts
    # ~100 ms/frame of sync layout copies around the FDFFN/FDSA conv
    # chains — a stencil is a layout-agnostic elementwise fusion, so it
    # removes the conv's layout constraint entirely (at the cost of 9
    # shifted reads the VPU fuses in VMEM).
    if (jax.default_backend() == "tpu" and groups > 1
            and groups == x.shape[-1] and w.shape[2] == 1
            and stride == (1, 1) and dilation == (1, 1)
            and out_layout == "NHWC"
            and os.environ.get("FDN_TPU_DW_STENCIL") == "1"):
        return _depthwise_stencil(x, w, b, padding, groups)
    disp = os.environ.get("FDN_CONV_DISPATCH", "")
    if mode != "fast" and out_layout == "NHWC" and stride == (1, 1) \
            and dilation == (1, 1) and disp:
        kh, kw_ = w.shape[0], w.shape[1]
        if disp in ("1", "both", "1x1") and kh == 1 and kw_ == 1 \
                and groups == 1 and padding == (0, 0):
            return _conv1x1_einsum(x, w, b)
        if disp in ("1", "both", "dw") and groups == x.shape[-1] \
                and w.shape[2] == 1:
            return _depthwise_stencil(x, w, b, padding, groups)
    if (groups > 1 and groups == x.shape[-1] and w.shape[2] == 1
            and w.shape[3] != groups and w.shape[3] % groups == 0
            and jax.default_backend() == "tpu"
            and os.environ.get("FDN_DW_M1", "1") == "1"):
        # Depthwise conv with channel multiplier m>1 (FDFFN/FCAFFN dwconv:
        # hidden -> 2*hidden, groups=hidden): XLA lowers the (G, m)
        # feature-group form into T(2,128) half-sublane tiles and re-lays
        # the result at every block — the largest sync copies in the whole
        # forward (1.25 ms/step for the level-1 Fuse alone). Rewriting as
        # a multiplier-1 depthwise conv over an m-duplicated input keeps
        # everything in native T(8,128) tiles. Same taps, same order:
        # torch output o belongs to group o//m, and repeat puts input
        # channel o//m at position o. Measured (OPTIMIZATIONS.md round-5):
        # bf16 serving is a wash (0.834 vs 0.841 MP/s, within noise), but
        # the m=1 form is 100x MORE exact in the f32 parity mode: the
        # (G,m) grouped conv at Precision.HIGH errs 2.4e-5 vs f64 while
        # m=1 is 2.0e-7 (the 'mixed' policy's "depthwise at HIGH is
        # f32-exact" claim only ever held for m=1). bf16 outputs are
        # bit-identical between the two forms.
        m = w.shape[3] // groups
        x = jnp.repeat(x, m, axis=-1)
        groups = w.shape[3]
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]

    def core(xx, ww, prec=None):
        return lax.conv_general_dilated(
            xx, ww,
            window_strides=stride,
            padding=pad,
            rhs_dilation=dilation,
            dimension_numbers=("NHWC", "HWIO", out_layout),
            feature_group_count=groups,
            preferred_element_type=x.dtype,
            precision=prec,
        )

    if mode == "x3":
        y = _conv_x3(core, x, w)
    elif mode == "highest":
        y = core(x, w, lax.Precision.HIGHEST)
    elif mode == "high":
        y = core(x, w, lax.Precision.HIGH)
    elif mode == "mixed":
        # depthwise at HIGH is already f32-exact (1.05e-7 measured — the
        # 3-pass bf16 split loses only the x_lo*w_lo term over 9 taps);
        # dense convs need HIGHEST for exactness (HIGH: 1.1e-5). The
        # multiplier-m>1 grouped form (FDN_DW_M1=0 fallback) is NOT
        # exact at HIGH (2.4e-5 vs f64, see the m-duplication note
        # above) — require w.shape[3] == groups so it takes HIGHEST.
        dw = (groups == x.shape[-1] and w.shape[2] == 1
              and w.shape[3] == groups)
        y = core(x, w, lax.Precision.HIGH if dw else lax.Precision.HIGHEST)
    else:
        y = core(x, w)
    if b is not None:
        y = y + (b.reshape(-1, 1, 1) if out_layout == "NCHW" else b)
    return y


def conv_transpose2d(x, w, b=None, stride=2, padding=1, kernel_size=None):
    """torch.nn.ConvTranspose2d(in, out, k, stride=s, padding=p) equivalent.

    Implemented as an input-dilated conv: out = conv(dilate(x, s), flip(w))
    with per-side padding k-1-p. `w` must already be in equivalent-HWIO,
    spatially flipped form: (kh, kw, Cin, Cout) — see torch_import.
    Output size: (H-1)*s - 2p + k. Same f32 precision policy as conv2d.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    kh, kw = w.shape[0], w.shape[1]
    ph = kh - 1 - padding
    pw = kw - 1 - padding

    def core(xx, ww, prec=None):
        return lax.conv_general_dilated(
            xx, ww,
            window_strides=(1, 1),
            padding=[(ph, ph), (pw, pw)],
            lhs_dilation=stride,
            dimension_numbers=_DN,
            preferred_element_type=x.dtype,
            precision=prec,
        )

    mode = _conv_mode(x.dtype)
    if mode == "x3":
        y = _conv_x3(core, x, w)
    elif mode in ("highest", "mixed"):
        y = core(x, w, lax.Precision.HIGHEST)  # transpose convs are dense
    elif mode == "high":
        y = core(x, w, lax.Precision.HIGH)
    else:
        y = core(x, w)
    if b is not None:
        y = y + b
    return y


def linear(x, w, b=None):
    """torch.nn.Linear; w: (in, out) — a dot, so the X6 algorithm
    applies (ops.precision), unlike convolutions."""
    from fdn_tip2025_tpu.ops.precision import dot_precision
    y = jnp.matmul(x, w, precision=dot_precision(x.dtype))
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
