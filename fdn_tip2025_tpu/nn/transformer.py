"""TransformerBlock / Fuse / patch-embed / resampling modules of FDformer.

Parity: reference FDN_arch.py:646-734 (TransformerBlock :646-677,
Fuse :679-695, OverlapPatchEmbed :700-709, Downsample :715-723,
Upsample :726-734).
"""

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.ops import (
    conv2d, init_conv2d, layer_norm_2d, init_layer_norm, interp_bilinear,
)
from fdn_tip2025_tpu.nn.attention import fdsa, init_fdsa
from fdn_tip2025_tpu.nn.ffn import fdffn, init_fdffn, fcaffn, init_fcaffn


def init_transformer_block(key, dim, bias=False, att=False, use_light=True,
                           use_img=True):
    ks = jax.random.split(key, 6)
    p = {"norm2": {"body": init_layer_norm(dim)},
         "ffn": init_fdffn(ks[0], dim, bias=bias)}
    if att:
        p["norm1"] = {"body": init_layer_norm(dim)}
        p["attn"] = init_fdsa(ks[1], dim, bias=bias)
    if use_light:
        p["norm3"] = {"body": init_layer_norm(dim)}
        p["ffn2"] = init_fcaffn(ks[2], dim, bias=bias, use_light=use_light,
                                use_img=use_img)
    return p


def _ln(p, x):
    return layer_norm_2d(x, p["body"]["weight"], p["body"]["bias"])


def transformer_block(params, state, att=False, use_light=True):
    """state = (x, x_high, x_p, x_img), threaded like the reference tuple."""
    x, x_high, x_p, x_img = state
    if att:
        x = x + fdsa(params["attn"], _ln(params["norm1"], x))
    x = x + fdffn(params["ffn"], _ln(params["norm2"], x), x_high, x_p, x_img)
    if use_light:
        x = x + fcaffn(params["ffn2"], _ln(params["norm3"], x),
                       x_high, x_p, x_img, use_light=True)
    return x, x_high, x_p, x_img


def init_fuse(key, n_feat):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv": init_conv2d(k1, 1, 1, n_feat * 2, n_feat * 2),
        "att_channel": init_transformer_block(k2, n_feat * 2, att=False,
                                              use_light=False),
        "conv2": init_conv2d(k3, 1, 1, n_feat * 2, n_feat * 2),
    }


def fuse(params, enc, dnc, x_high, x_high_p, x_img):
    n_feat = enc.shape[-1]
    x = jnp.concatenate([enc, dnc], axis=-1)
    x = conv2d(x, params["conv"]["weight"], params["conv"]["bias"])
    x = transformer_block(params["att_channel"],
                          (x, x_high, x_high_p, x_img),
                          att=False, use_light=False)[0]
    x = conv2d(x, params["conv2"]["weight"], params["conv2"]["bias"])
    e, d = x[..., :n_feat], x[..., n_feat:]
    return e + d


def init_overlap_patch_embed(key, in_c=3, embed_dim=48, bias=False):
    return {"proj": init_conv2d(key, 3, 3, in_c, embed_dim, bias=bias)}


def overlap_patch_embed(params, x):
    return conv2d(x, params["proj"]["weight"], params["proj"].get("bias"),
                  padding=1)


def init_downsample(key, n_feat):
    return {"body": {"1": init_conv2d(key, 3, 3, n_feat, n_feat * 2,
                                      bias=False)}}


def downsample(params, x):
    x = interp_bilinear(x, 0.5)
    return conv2d(x, params["body"]["1"]["weight"], None, padding=1)


def init_upsample(key, n_feat):
    return {"body": {"1": init_conv2d(key, 3, 3, n_feat, n_feat // 2,
                                      bias=False)}}


def upsample(params, x):
    x = interp_bilinear(x, 2.0)
    return conv2d(x, params["body"]["1"]["weight"], None, padding=1)
