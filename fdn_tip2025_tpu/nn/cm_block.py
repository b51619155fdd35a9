"""Channel-major (NCHW) TransformerBlock pipeline — the single-layout
level-1 campaign (VERDICT-r4 #1).

Reference hot loop this re-lays: FDN_arch.py:666-677 x the 16 full-res
level-1 blocks (enc 6 + dec 6 + refine 4). The NHWC home layout puts
C=32..86 in the 128-wide lane dim (1.5-4x tile padding), and the round-3/4
byte audits attribute ~278 ms of the 828 ms bf16 frame to the relayout
copies XLA inserts between conv-optimal and DFT/elementwise-optimal
layouts, plus ~84 ms of block-boundary copies on the dim-32 LN/residual
chain alone.

Here the block state lives in NCHW (B, C, H, W): W rides the lanes
(1120 = dense), H the sublanes, so every elementwise/LN/residual op runs
on full tiles, the lax.scan carry's DEFAULT layout is already dense (no
per-iteration relayout at the loop boundary), and:

  * 1x1 convs are channel-contraction einsums emitting NCHW directly
    (the MXU does any relayout as a side effect of the dot);
  * the 8x8-patch DFTs contract straight out of channel-major patches
    (ops.fourier.to_patches_cm_nchw — the permutation never moves the
    channel axis);
  * FCAFFN's full-image spectral segment reuses the channel-major core
    that already exists (nn/ffn._fcaffn_spectral_core_cm);
  * only the depthwise 3x3 convs need NHWC — each gets an explicit
    island (transpose in, conv writes NCHW back via out_layout) instead
    of letting layout assignment scatter copies around every op.

Numerics: identical op set and order as the NHWC blocks up to dot/reduce
associativity — f32 parity within the usual 1e-5 band, bf16 within ulps
(tests/test_cm_block.py). Enable with FDN_CM_LEVEL1=1 (trace-time), which
runs the level-1 encoder / decoder+refinement chains of FDformer in this
layout.
"""

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.ops import (
    conv2d, gelu, replace_denormals,
    rfft2_patch8_cm, irfft2_patch8_cm, to_patches_cm_nchw, param_cm,
)
from fdn_tip2025_tpu.ops.fourier import (
    from_patches_cm_nchw, _patch_dft_precision,
)
from fdn_tip2025_tpu.ops.norm import layer_norm_nchw
from fdn_tip2025_tpu.ops.precision import dot_precision
from fdn_tip2025_tpu.nn.attention import (
    INNER, _spectral_combine, _fdsa_cm_tail,
)
from fdn_tip2025_tpu.nn.ffn import _fcaffn_spectral_core_cm


def to_nchw(x):
    """(B, H, W, C) -> (B, C, H, W)."""
    return jnp.transpose(x, (0, 3, 1, 2))


def from_nchw(x):
    """(B, C, H, W) -> (B, H, W, C)."""
    return jnp.transpose(x, (0, 2, 3, 1))


def _conv1x1_nchw(x, w, b=None):
    """1x1 conv on NCHW input, NCHW output. w: (1, 1, Cin, Cout)."""
    y = jnp.einsum("io,bihw->bohw", w[0, 0], x,
                   precision=dot_precision(x.dtype))
    if b is not None:
        y = y + b.reshape(1, -1, 1, 1)
    return y


def _conv1x1_from_nhwc(x, w, b=None):
    """1x1 conv on NHWC input emitting NCHW. w: (1, 1, Cin, Cout)."""
    y = jnp.einsum("bhwi,io->bohw", x, w[0, 0],
                   precision=dot_precision(x.dtype))
    if b is not None:
        y = y + b.reshape(1, -1, 1, 1)
    return y


def _nchw_to_cm(x):
    """(B, C, H, W) -> (C, B, H, W) for the FCAFFN spectral core. At
    serving batch 1 this is a pure reshape (bitcast); otherwise a
    leading-dims transpose (whole-plane moves, no tile reshuffle)."""
    if x.shape[0] == 1:
        return x.reshape(x.shape[1], 1, x.shape[2], x.shape[3])
    return jnp.transpose(x, (1, 0, 2, 3))


def _cm_to_nchw(x):
    if x.shape[1] == 1:
        return x.reshape(1, x.shape[0], x.shape[2], x.shape[3])
    return jnp.transpose(x, (1, 0, 2, 3))


def _ln(p, x):
    return layer_norm_nchw(x, p["body"]["weight"], p["body"]["bias"])


def fdsa_nchw(params, x):
    """FDSA on NCHW state. Same math as nn.attention.fdsa's channel-major
    core (shared _spectral_combine/_fdsa_cm_tail); entry 1x1 is a CM
    einsum, the dwconvs take one NHWC island and write NCHW back, and
    the patch DFT contracts straight out of channel-major patches."""
    expand4 = params["to_hidden"]["weight"].shape[-1]
    expand = expand4 // INNER
    c3 = 3 * expand
    b, _, hh, ww = x.shape

    hidden = _conv1x1_nchw(x, params["to_hidden"]["weight"],
                           params["to_hidden"].get("bias"))
    hid = from_nchw(hidden)                      # NHWC island for dwconvs
    dwk = params["to_hidden_dw"]["weight"]
    dwb = params["to_hidden_dw"].get("bias")
    # exact per-channel split of the depthwise kernel (as in fdsa())
    h_qkv = conv2d(hid[..., :c3], dwk[..., :c3],
                   None if dwb is None else dwb[:c3],
                   padding=1, groups=c3, out_layout="NCHW")
    h_vv = conv2d(hid[..., c3:], dwk[..., c3:],
                  None if dwb is None else dwb[c3:],
                  padding=1, groups=expand, out_layout="NCHW")

    t_qkv = to_patches_cm_nchw(h_qkv)            # (3E, 64, N)
    v_value_p = to_patches_cm_nchw(h_vv)         # (E, 64, N)
    fr, fi = rfft2_patch8_cm(t_qkv)              # (3E, 40, N)
    dt = t_qkv.dtype
    cat_r, cat_i = _spectral_combine(fr, fi, params["fft"], expand, dt)
    outs = irfft2_patch8_cm(cat_r.astype(dt), cat_i.astype(dt))
    prec = _patch_dft_precision(dt)
    return _fdsa_cm_tail(params, outs, v_value_p, expand, prec,
                         b, hh, ww, out_layout="NCHW")


def fdffn_nchw(params, x):
    """FDFFN on NCHW state. Spatial dwconv branch and the gated dwconv
    stay NHWC islands; the patch-DFT rotation runs channel-major with the
    patchify permutation never moving the channel axis."""
    hidden = params["project_in"]["weight"].shape[-1]
    b, _, hh, ww = x.shape
    x86 = _conv1x1_nchw(x, params["project_in"]["weight"],
                        params["project_in"].get("bias"))
    xh = from_nchw(x86)                          # NHWC island
    sp = params["space"]
    x1 = conv2d(xh, sp["0"]["weight"], sp["0"].get("bias"), padding=1,
                groups=hidden)
    x1 = gelu(x1)
    x1 = conv2d(x1, sp["2"]["weight"], sp["2"].get("bias"), padding=1,
                groups=hidden)

    # constant complex rotation of the patch spectrum (see fdffn())
    cr = params["ffta"] * jnp.cos(params["fftp"])
    sr = params["ffta"] * jnp.sin(params["fftp"])
    pts = to_patches_cm_nchw(x86)                # (C, 64, N)
    pr, pi = rfft2_patch8_cm(pts)                # (C, 40, N)
    dt = pr.dtype
    pr, pi = replace_denormals((pr, pi))
    crn = param_cm(cr)                           # (C, 40, 1)
    srn = param_cm(sr)
    rr = pr * crn + pi * srn
    ii = pi * crn - pr * srn
    out = irfft2_patch8_cm(rr.astype(dt), ii.astype(dt))   # (C, 64, N)
    # meet the NHWC spatial branch where the gate conv needs it anyway
    from fdn_tip2025_tpu.ops import from_patches_cm
    xs = from_patches_cm(out, b, hh, ww) + x1    # NHWC

    g = conv2d(xs, params["dwconv"]["weight"], params["dwconv"].get("bias"),
               padding=1, groups=hidden)
    g1, g2 = jnp.split(g, 2, axis=-1)
    gated = gelu(g1) * g2
    return _conv1x1_from_nhwc(gated, params["project_out"]["weight"],
                              params["project_out"].get("bias"))


def fcaffn_nchw(params, x, x_high, xp2, x_img):
    """FCAFFN on NCHW state (encoder blocks only). The full-image
    spectral segment reuses the existing channel-major core; the
    mul/add image conditioning and the gated dwconv are NHWC islands."""
    hidden = params["project_in"]["weight"].shape[-1]
    xc = _nchw_to_cm(x)                          # (C, B, H, W)
    xc = _fcaffn_spectral_core_cm(params, xc, x_high, xp2)
    x = _cm_to_nchw(xc)

    x = _conv1x1_nchw(x, params["project_in"]["weight"],
                      params["project_in"].get("bias"))
    mul = conv2d(x_img, params["conv1_mul"]["weight"],
                 params["conv1_mul"].get("bias"))
    add = conv2d(x_img, params["conv1_add"]["weight"],
                 params["conv1_add"].get("bias"))
    mul = conv2d(mul, params["conv3_mul"]["weight"],
                 params["conv3_mul"].get("bias"), padding=1,
                 groups=hidden, out_layout="NCHW")
    add = conv2d(add, params["conv3_add"]["weight"],
                 params["conv3_add"].get("bias"), padding=1,
                 groups=hidden, out_layout="NCHW")
    x = x * mul + add

    xh = from_nchw(x)                            # NHWC island for the gate
    g = conv2d(xh, params["dwconv"]["weight"], params["dwconv"].get("bias"),
               padding=1, groups=hidden)
    g1, g2 = jnp.split(g, 2, axis=-1)
    gated = gelu(g1) * g2
    return _conv1x1_from_nhwc(gated, params["project_out"]["weight"],
                              params["project_out"].get("bias"))


def transformer_block_nchw(params, state, att=False, use_light=True):
    """TransformerBlock on NCHW state. state = (x_nchw, x_high, x_p,
    x_img) — the three conditioning tensors stay NHWC (B, H, W, 3) as the
    encoders' FCAFFN consumes them (its prior 1x1s contract them straight
    into channel-major)."""
    x, x_high, x_p, x_img = state
    if att:
        x = x + fdsa_nchw(params["attn"], _ln(params["norm1"], x))
    x = x + fdffn_nchw(params["ffn"], _ln(params["norm2"], x))
    if use_light:
        x = x + fcaffn_nchw(params["ffn2"], _ln(params["norm3"], x),
                            x_high, x_p, x_img)
    return x, x_high, x_p, x_img
