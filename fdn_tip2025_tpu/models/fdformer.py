"""FDformer — 3-level frequency-domain U-Net transformer.

Parity: reference FDN_arch.py:753-842. Encoders condition on MAR priors
(use_light=True); decoders and refinement do not.
"""

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.ops import conv2d, init_conv2d
from fdn_tip2025_tpu.ops.norm import init_layer_norm
from fdn_tip2025_tpu.nn import (
    transformer_block, init_transformer_block,
    fuse, init_fuse,
    overlap_patch_embed, init_overlap_patch_embed,
    downsample, init_downsample, upsample, init_upsample,
)


def init_fdformer(key, inp_channels=3, out_channels=3, dim=48,
                  num_blocks=(6, 6, 10), num_refinement_blocks=4,
                  bias=False):
    ks = iter(jax.random.split(key, 256))

    def blocks(n, d, att, use_light):
        return {str(i): init_transformer_block(next(ks), d, bias=bias,
                                               att=att, use_light=use_light)
                for i in range(n)}

    d1, d2, d3 = dim, dim * 2, dim * 4
    return {
        "patch_embed": init_overlap_patch_embed(next(ks), inp_channels, dim,
                                                bias=bias),
        "encoder_level1": blocks(num_blocks[0], d1, True, True),
        "down1_2": init_downsample(next(ks), d1),
        "encoder_level2": blocks(num_blocks[1], d2, True, True),
        "down2_3": init_downsample(next(ks), d2),
        "encoder_level3": blocks(num_blocks[2], d3, True, True),
        "decoder_level3": blocks(num_blocks[2], d3, True, False),
        "up3_2": init_upsample(next(ks), d3),
        # Present in the reference state dict but never called in forward
        # (FDN_arch.py:787 vs :824-827) — kept for checkpoint compatibility.
        "reduce_chan_level2": init_conv2d(next(ks), 1, 1, d3, d2, bias=bias),
        "decoder_level2": blocks(num_blocks[1], d2, True, False),
        "up2_1": init_upsample(next(ks), d2),
        "decoder_level1": blocks(num_blocks[0], d1, True, False),
        "refinement": blocks(num_refinement_blocks, d1, True, False),
        "fuse2": init_fuse(next(ks), d2),
        "fuse1": init_fuse(next(ks), d1),
        "output": init_conv2d(next(ks), 3, 3, d1, out_channels, bias=bias),
        # Defined but unused in forward (FDN_arch.py:808); kept for ckpt.
        "norm": {"body": init_layer_norm(3)},
    }


def _run_blocks(params, state, att, use_light, use_scan=None,
                layout="NHWC"):
    """Run a stack of same-shaped TransformerBlocks.

    use_scan stacks the per-block param trees and lax.scans one block body
    over them — one traced block instead of N, cutting XLA compile time
    ~N-fold for the 44-block FDformer with identical numerics (the blocks
    are structurally identical within a group).

    layout="NCHW" runs the channel-major block variant (nn/cm_block.py,
    the level-1 single-layout pipeline): state[0] must already be NCHW,
    and the scan carry keeps the dense W-minor layout across iterations.
    """
    import os
    if layout == "NCHW":
        from fdn_tip2025_tpu.nn.cm_block import transformer_block_nchw
        block_fn = transformer_block_nchw
    else:
        block_fn = transformer_block
    if use_scan is None:
        use_scan = os.environ.get("FDN_UNROLL") != "1"
    n = len(params)
    if not use_scan or n == 1:
        for i in range(n):
            state = block_fn(params[str(i)], state, att=att,
                             use_light=use_light)
        return state

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[params[str(i)] for i in range(n)])
    x, x_high, x_p, x_img = state

    def body(x, blk):
        x = block_fn(blk, (x, x_high, x_p, x_img), att=att,
                     use_light=use_light)[0]
        return x, None

    # Rematerialize each block in the backward pass: without this,
    # lax.scan saves every block's wide intermediates (4.8x-dim spectra)
    # for ALL iterations — the reference training recipe (batch 16,
    # 128x128 crops) needs 122 GB of activations on a 15.75 GB chip.
    # One block's recompute (~1/44 of the forward) buys 6-10x activation
    # memory. No effect on inference-only jits. FDN_REMAT=0 opts out.
    if os.environ.get("FDN_REMAT") != "0":
        body = jax.checkpoint(body)

    # FDN_SCAN_UNROLL=k unrolls k block bodies per loop iteration
    # (full unroll FDN_UNROLL=1 measured SLOWER — the scanned body
    # pipelines better; partial unroll trades loop overhead vs weight
    # staging overlap).
    unroll = int(os.environ.get("FDN_SCAN_UNROLL", "1"))
    x, _ = jax.lax.scan(body, x, stacked, unroll=unroll)
    return x, x_high, x_p, x_img


def fdformer_forward(params, inp_img, ori_img=None,
                     x_high1=None, x_high2=None, x_high3=None,
                     x_high12=None, x_high22=None, x_high32=None,
                     x1=None, x2=None, x3=None):
    """x_high* = amplitude priors, x_high*2 = phase priors, x* = MAR images,
    each at scales 1x / 2x-down / 4x-down."""
    import os
    # FDN_CM_LEVEL1=1 (trace-time): run the full-resolution level-1
    # chains (enc1, dec1+refinement — 16 of the 44 blocks, at 1x pixels)
    # in the channel-major NCHW layout (nn/cm_block.py). One transpose
    # in/out per chain; everything between stays W-minor dense.
    cm1 = os.environ.get("FDN_CM_LEVEL1") == "1"
    e1 = overlap_patch_embed(params["patch_embed"], inp_img)
    if cm1:
        from fdn_tip2025_tpu.nn.cm_block import to_nchw, from_nchw
        e1 = from_nchw(_run_blocks(
            params["encoder_level1"], (to_nchw(e1), x_high1, x_high12, x1),
            True, True, layout="NCHW")[0])
    else:
        e1 = _run_blocks(params["encoder_level1"],
                         (e1, x_high1, x_high12, x1), True, True)[0]
    e2 = downsample(params["down1_2"], e1)
    e2 = _run_blocks(params["encoder_level2"],
                     (e2, x_high2, x_high22, x2), True, True)[0]
    e3 = downsample(params["down2_3"], e2)
    e3 = _run_blocks(params["encoder_level3"],
                     (e3, x_high3, x_high32, x3), True, True)[0]
    d3 = _run_blocks(params["decoder_level3"],
                     (e3, x_high3, x_high32, x3), True, False)[0]
    d2 = upsample(params["up3_2"], d3)
    d2 = fuse(params["fuse2"], d2, e2, x_high2, x_high22, x2)
    d2 = _run_blocks(params["decoder_level2"],
                     (d2, x_high2, x_high22, x2), True, False)[0]
    d1 = upsample(params["up2_1"], d2)
    d1 = fuse(params["fuse1"], d1, e1, x_high1, x_high12, x1)
    if cm1:
        d1c = to_nchw(d1)
        d1c = _run_blocks(params["decoder_level1"],
                          (d1c, x_high1, x_high12, x1), True, False,
                          layout="NCHW")[0]
        d1c = _run_blocks(params["refinement"],
                          (d1c, x_high1, x_high12, x1), True, False,
                          layout="NCHW")[0]
        d1 = from_nchw(d1c)
    else:
        d1 = _run_blocks(params["decoder_level1"],
                         (d1, x_high1, x_high12, x1), True, False)[0]
        d1 = _run_blocks(params["refinement"],
                         (d1, x_high1, x_high12, x1), True, False)[0]
    out = conv2d(d1, params["output"]["weight"],
                 params["output"].get("bias"), padding=1)
    return out + (inp_img if ori_img is None else ori_img)
