"""MAR — amplitude/illumination restoration network (gamma-map predictor).

Parity: reference FDN_arch.py:149-286 (MAR_archa + MAR wrapper); the lolv1
MAR body `fourier_multi_scale_gamma2` (fdnlol24_arch.py:97-207) differs only
in its ProcessBlock variant (see nn.basic.process_block) and its use_ratio
guard.

Multiscale gamma maps at 1x, 1/2, 1/4; brightening x' = 1 - (1-x)^(40 m).
"""

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.ops import (
    conv2d, init_conv2d, interp_nearest, interp_bilinear, pixel_unshuffle,
    gamma_brighten,
)
from fdn_tip2025_tpu.nn import (
    basic_conv, init_basic_conv, fam, init_fam, process_block,
    init_process_block, fourier_fuse, init_fourier_fuse,
)

BASE = 12
EPS = 1e-8


def init_mar_archa(key, variant="fdn"):
    ks = jax.random.split(key, 24)
    b = BASE
    p = {
        "Encoder": {"0": init_process_block(ks[0], b),
                    "1": init_process_block(ks[1], b * 2),
                    "2": init_process_block(ks[2], b * 4)},
        "Decoder": {"0": init_process_block(ks[3], b * 4),
                    "1": init_process_block(ks[4], b * 2),
                    "2": init_process_block(ks[5], b)},
        "Convs": {"0": init_basic_conv(ks[6], b * 4, b * 2, 1)[0],
                  "1": init_basic_conv(ks[7], b * 2, b, 1)[0]},
        "ConvsOut": {"0": init_basic_conv(ks[8], b * 4, 3, 3,
                                          relu=False)[0],
                     "1": init_basic_conv(ks[9], b * 2, 3, 3,
                                          relu=False)[0]},
        "AFFs": {"0": init_fourier_fuse(ks[10], b * 7, b),
                 "1": init_fourier_fuse(ks[11], b * 7, b * 2)},
        "FAM1": init_fam(ks[12], b * 4),
        "FAM2": init_fam(ks[13], b * 2),
        "f1": {"0": init_conv2d(ks[14], 1, 1, 3 * 16, b * 4),
               "1": init_process_block(ks[15], b * 4)},
        "f2": {"0": init_conv2d(ks[16], 1, 1, 3 * 4, b * 2),
               "1": init_process_block(ks[17], b * 2)},
        "f3": {"0": init_conv2d(ks[18], 1, 1, 3, b),
               "1": init_process_block(ks[19], b)},
        "f3_down": init_basic_conv(ks[20], b, b * 2, 3, stride=2)[0],
        "f2_down": init_basic_conv(ks[21], b * 2, b * 4, 3, stride=2)[0],
        "f2_up": init_basic_conv(ks[22], b * 4, b * 2, 4, stride=2,
                                 transpose=True)[0],
        "f3_up": init_basic_conv(ks[23], b * 2, b, 4, stride=2,
                                 transpose=True)[0],
        "out": init_basic_conv(jax.random.fold_in(key, 99), b, 3, 3,
                               relu=False)[0],
    }
    return p


def _pb(p, x, variant):
    return process_block(p, x, spatial=False, variant=variant)


def _f_stem(p, x, variant):
    x = conv2d(x, p["0"]["weight"], p["0"]["bias"])
    return _pb(p["1"], x, variant)


def mar_archa_forward(params, x, ratio, variant="fdn", use_ratio=True):
    """Returns gamma maps [m_quarter, m_half, m_full] (small -> large)."""
    v = variant
    x_2 = interp_nearest(x, 0.5)
    x_4 = interp_nearest(x_2, 0.5)
    x_2_p = pixel_unshuffle(x, 2)
    x_4_p = pixel_unshuffle(x, 4)

    z2 = _f_stem(params["f2"], x_2_p, v)
    z4 = _f_stem(params["f1"], x_4_p, v)
    x_ = _f_stem(params["f3"], x, v)
    if use_ratio:
        z2 = z2 * ratio
        z4 = z4 * ratio
        x_ = x_ * ratio

    res1 = _pb(params["Encoder"]["0"], x_, v)
    z = basic_conv(params["f3_down"], res1, 3, stride=2)
    z = fam(params["FAM2"], z, z2)
    res2 = _pb(params["Encoder"]["1"], z, v)
    z = basic_conv(params["f2_down"], res2, 3, stride=2)
    z = fam(params["FAM1"], z, z4)
    z = _pb(params["Encoder"]["2"], z, v)

    z12 = interp_nearest(res1, 0.5)
    z21 = interp_nearest(res2, 2.0)
    z42 = interp_nearest(z, 2.0)
    z41 = interp_nearest(z42, 2.0)
    res2 = fourier_fuse(params["AFFs"]["1"], z12, res2, z42)
    res1 = fourier_fuse(params["AFFs"]["0"], res1, z21, z41)

    z = _pb(params["Decoder"]["0"], z, v)
    z_ = basic_conv(params["ConvsOut"]["0"], z, 3, relu=False)
    z = basic_conv(params["f2_up"], z, 4, stride=2, transpose=True)
    out_q = jax.nn.sigmoid(z_ + x_4) + EPS

    z = jnp.concatenate([z, res2], axis=-1)
    z = basic_conv(params["Convs"]["0"], z, 1)
    z = _pb(params["Decoder"]["1"], z, v)
    z_ = basic_conv(params["ConvsOut"]["1"], z, 3, relu=False)
    z = basic_conv(params["f3_up"], z, 4, stride=2, transpose=True)
    out_h = jax.nn.sigmoid(z_ + x_2) + EPS

    z = jnp.concatenate([z, res1], axis=-1)
    z = basic_conv(params["Convs"]["1"], z, 1)
    z = _pb(params["Decoder"]["2"], z, v)
    z = basic_conv(params["out"], z, 3, relu=False)
    out_f = jax.nn.sigmoid(z + x) + EPS

    return [out_q, out_h, out_f]


def init_mar(key, variant="fdn"):
    return {"net": init_mar_archa(key, variant)}


def mar_forward(params, x, ratio=None, variant="fdn", use_ratio=True,
                scale=40.0):
    """MAR wrapper (FDN_arch.py:261-286): gamma-brighten at 3 scales.

    ratio: (B, 1, 1, 1) brightness ratio. Returns (x_q, x_h, x_f)
    (quarter, half, full resolution), matching the reference ordering
    (x_high3, x_high2, x_high1).
    """
    x_h = interp_bilinear(x, 0.5)
    x_q = interp_bilinear(x_h, 0.5)
    m_q, m_h, m_f = mar_archa_forward(params["net"], x, ratio,
                                      variant=variant, use_ratio=use_ratio)
    return (
        gamma_brighten(x_q, m_q, scale),
        gamma_brighten(x_h, m_h, scale),
        gamma_brighten(x, m_f, scale),
    )
