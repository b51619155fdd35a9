"""FDN — frozen MAR + FDformer with Fourier amplitude/phase conditioning.

Parity: reference FDN_arch.py:847-921 (FDN, dim=32, blocks [6,6,10]) and
fdnlol24_arch.py:951-1033 (FDN_lolv1, dim=24, lolv1 MAR body, returns the
restored image four times).

Unlike the reference, MAR weights are NOT torch.load'ed from a hardcoded
path inside the constructor (FDN_arch.py:860-862) — pass them explicitly
via checkpoint.torch_import / merge into the param tree.
"""

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.ops import (
    layer_norm_2d, interp_bilinear, rfft2, replace_denormals,
)
from fdn_tip2025_tpu.ops.fourier import rfft2_ri
from fdn_tip2025_tpu.ops.norm import init_layer_norm
from fdn_tip2025_tpu.models.mar import init_mar, mar_forward
from fdn_tip2025_tpu.models.fdformer import init_fdformer, fdformer_forward


def _init_fdn_common(key, dim, variant):
    k1, k2 = jax.random.split(key)
    return {
        "net_a": init_mar(k1, variant=variant),
        "net_p": init_fdformer(k2, inp_channels=3, out_channels=3, dim=dim,
                               num_blocks=(6, 6, 10),
                               num_refinement_blocks=4, bias=False),
        "norm1": {"body": init_layer_norm(3)},
        "norm2": {"body": init_layer_norm(3)},
        "norm3": {"body": init_layer_norm(3)},
    }


def init_fdn(key):
    return _init_fdn_common(key, dim=32, variant="fdn")


def init_fdn_lolv1(key):
    return _init_fdn_common(key, dim=24, variant="lolv1")


def _ln(p, x):
    return layer_norm_2d(x, p["body"]["weight"], p["body"]["bias"])


def _phase_prior(x):
    if x.dtype == jnp.bfloat16:
        # bf16 spectra end to end (operand rounding identical to the f32
        # fast path; only the stored planes shrink — VERDICT-r2 #1a)
        re, im = rfft2_ri(x)
        re, im = replace_denormals((re, im))
        return jnp.arctan2(im, re)
    f = rfft2(x)
    f = replace_denormals(f)
    return jnp.angle(f).astype(x.dtype)


def _amp_prior(x):
    # NOTE: deliberately no denormal clamp here (commented out in the
    # reference, FDN_arch.py:902-913).
    if x.dtype == jnp.bfloat16:
        re, im = rfft2_ri(x)
        return jnp.sqrt(re * re + im * im)
    return jnp.abs(rfft2(x)).astype(x.dtype)


def _fdn_forward(params, inp_img, ratio_i, variant):
    """ratio_i: (B, 1) predicted/derived brightness ratio."""
    ratio = ratio_i.reshape(ratio_i.shape[0], 1, 1, 1)

    x1n = _ln(params["norm1"], inp_img)
    x2n = _ln(params["norm2"], interp_bilinear(inp_img, 0.5))
    x3n = _ln(params["norm3"],
              interp_bilinear(interp_bilinear(inp_img, 0.5), 0.5))
    ph1 = _phase_prior(x1n)
    ph2 = _phase_prior(x2n)
    ph3 = _phase_prior(x3n)

    mar_q, mar_h, mar_f = mar_forward(params["net_a"], inp_img, ratio,
                                      variant=variant)
    amp1 = _amp_prior(_ln(params["norm1"], mar_f))
    amp2 = _amp_prior(_ln(params["norm2"], mar_h))
    amp3 = _amp_prior(_ln(params["norm3"], mar_q))

    # Mixed-precision serving: when the FDformer weights are sub-f32
    # (bf16 mode), cast its inputs at this boundary so the prior/MAR
    # stages can run in f32 like the reference's .float() discipline
    # (inputs and params must agree for convs).
    pdt = params["net_p"]["patch_embed"]["proj"]["weight"].dtype
    cast = (lambda t: t.astype(pdt)) if pdt != inp_img.dtype \
        else (lambda t: t)

    out = fdformer_forward(
        params["net_p"], cast(inp_img), ori_img=cast(inp_img),
        x_high1=cast(amp1), x_high2=cast(amp2), x_high3=cast(amp3),
        x_high12=cast(ph1), x_high22=cast(ph2), x_high32=cast(ph3),
        x1=cast(mar_f), x2=cast(mar_h), x3=cast(mar_q))
    return out, mar_f, mar_h, mar_q


def fdn_forward(params, inp_img, ratio_i):
    """Returns (restored, mar_1x, mar_2x, mar_4x) like FDN_arch.py:921."""
    return _fdn_forward(params, inp_img, ratio_i, variant="fdn")


def fdn_lolv1_forward(params, inp_img, ratio_i):
    """Returns (restored,)*4 like fdnlol24_arch.py:1033."""
    out, _, _, _ = _fdn_forward(params, inp_img, ratio_i, variant="lolv1")
    return out, out, out, out
