"""Pallas TPU depthwise 3x3 convolution (stride 1, pad 1, NHWC).

Why this kernel exists: the round-3 per-op device audit
(benchmarks/artifacts/byte_audit_bf16_r3.json + the HLO/profile join in
OPTIMIZATIONS.md) attributes ~243 ms of the 860 ms bf16 serving frame to
convolution fusions and another ~142 ms to the layout copies XLA places
around them; the depthwise convs run at <10% of HBM peak (e.g. 1.82 ms
for a 123 MB FDFFN dwconv = 67 GB/s vs the ~819 GB/s ceiling). A
depthwise conv is a pure-bandwidth stencil — no MXU involved — so a
VMEM-resident 9-tap FMA over row strips reads the input once and writes
the output once, the speed-of-light formulation. (This is unlike the
round-2/4 Pallas attempts that raced XLA's MXU DFT matmuls and lost.)

Fusions offered (all element-wise tails that otherwise cost another
full-size HBM round trip):
  * act='gelu'      — erf GELU on the output (FDFFN space branch,
                      reference FDN_arch.py:447-452)
  * gate=True       — the reference's dwconv(hidden -> 2*hidden,
                      groups=hidden) followed by chunk(2) and
                      gelu(g1) * g2 (FDN_arch.py:455, 470-472 /
                      :421-427): the kernel computes the even/odd tap
                      sets separately (input read stays C wide) and
                      writes only the C-wide gated result, in a channel
                      order the consumer's 1x1 folds away (gate_perm).

Grid: (B, H / TILE_H) row strips over a spatially pre-padded input; each
strip's 2 halo rows arrive via two extra 1-row Blocked specs over the
same operand and are concatenated in VMEM (_window — see its docstring
for why the overlap can't be expressed any other way here). Weights ride
in VMEM as (9, C) planes.

Inference-path only (FDN_PALLAS_DW=1, bf16 serving); training keeps the
XLA conv (differentiable, and the copies it pays are harmless at crop
sizes). CPU tests run in interpret mode.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_gelu(x):
    """Exact-class (erf) GELU, Mosaic-lowerable.

    Mosaic has no erf/erfc primitive (NotImplementedError at lowering),
    so this uses the Abramowitz-Stegun 7.1.26 rational-exp approximation
    (|err| <= 1.5e-7 in f32 — two orders below bf16 resolution, and the
    serving path is bf16-only). Computed in f32, cast back. Matches
    ops.image.gelu (jax.nn.gelu approximate=False) to <=1.1e-7 rel.
    """
    xf = x.astype(jnp.float32)
    z = xf * np.float32(0.7071067811865476)          # x / sqrt(2)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + np.float32(0.3275911) * az)
    poly = t * (np.float32(0.254829592) + t * (
        np.float32(-0.284496736) + t * (np.float32(1.421413741) + t * (
            np.float32(-1.453152027) + t * np.float32(1.061405429)))))
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    erf = jnp.sign(z) * erf_abs
    return (0.5 * xf * (1.0 + erf)).astype(x.dtype)


def _window(x_ref, h1_ref, h2_ref):
    """(th+2)-row halo window: main th-row block + two 1-row halo blocks,
    concatenated in VMEM. All standard Blocked specs. Alternatives
    measured/attempted on v5e (journal, round 3):
    Element-indexed overlapping blocks crash Mosaic's remote compile at
    this size; a single HBM (ANY) operand with in-kernel DMA windows is
    rejected by Mosaic's slice-alignment rules (window extent must be
    8-aligned in sublanes AND the lane dim 128-aligned — C=86 windows are
    unexpressible). Round 3 passed the SAME padded operand three times
    (main + 2 halo views) — XLA de-aliased that with TWO FULL-TENSOR
    copies per call. Round 4: the halo rows are pre-sliced into separate
    (B, H/th, W, C) tensors (2/th of the input in bytes) so no operand
    aliases another and the de-alias copies disappear."""
    return jnp.concatenate([x_ref[:], h1_ref[:], h2_ref[:]], axis=1)


def _stencil(xb, wk, th, w_out):
    """9-tap FMA; accumulates in f32 like XLA's conv (bf16 accumulation
    measured 9e-2 max-abs off the XLA conv on N(0,1) inputs; f32
    accumulation is within bf16 rounding of it)."""
    wk = wk.astype(jnp.float32)
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = xb[:, dy:dy + th, dx:dx + w_out, :].astype(jnp.float32)
            term = t * wk[dy * 3 + dx][None, None, None, :]
            acc = term if acc is None else acc + term
    return acc


def _dw_kernel(x_ref, h1_ref, h2_ref, w_ref, o_ref, *, th, w_out, act):
    acc = _stencil(_window(x_ref, h1_ref, h2_ref), w_ref[:], th, w_out)
    dt = o_ref.dtype
    if act == "gelu":
        o_ref[:] = _erf_gelu(acc).astype(dt)
    elif act == "leaky":
        o_ref[:] = jax.nn.leaky_relu(acc, 0.1).astype(dt)
    else:
        o_ref[:] = acc.astype(dt)


def _dw_gate_kernel(x_ref, h1_ref, h2_ref, wa_ref, wb_ref, o_ref, *,
                    th, w_out, cin):
    """dwconv(C -> 2C, groups=C) + chunk(2) + gelu(g1)*g2, emitted in the
    PERMUTED channel order `gate_perm` (see dwconv3x3_gate): torch's
    grouped output o uses input o//2, so the two tap sets (even outputs
    wa = w[..., 0::2], odd wb = w[..., 1::2]) each read the input lanes
    IN PLACE — no lane interleave anywhere; the consumer's 1x1 projection
    absorbs the permutation as a free weight-row reorder."""
    xb = _window(x_ref, h1_ref, h2_ref)
    a = _stencil(xb, wa_ref[:], th, w_out)   # a[i] = g_full[2i]
    b = _stencil(xb, wb_ref[:], th, w_out)   # b[i] = g_full[2i+1]
    c2 = cin // 2
    # gate[2i]   = gelu(g1[2i])  *g2[2i]   = gelu(a[i])*a[c2+i]
    # gate[2i+1] = gelu(g1[2i+1])*g2[2i+1] = gelu(b[i])*b[c2+i]
    u = _erf_gelu(a[..., :c2]) * a[..., c2:]
    v = _erf_gelu(b[..., :c2]) * b[..., c2:]
    o_ref[:] = jnp.concatenate([u, v], axis=-1).astype(o_ref.dtype)


def use_pallas_dw(x, bias):
    """Trace-time gate for the serving-path Pallas depthwise kernels:
    FDN_PALLAS_DW=1, bf16 activations, bias-free (all FDformer dwconvs
    are bias=False), TPU backend."""
    import os
    return (os.environ.get("FDN_PALLAS_DW") == "1"
            and bias is None
            and x.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu")


# Mosaic's default scoped-VMEM limit is 16 MB and its stack allocator
# materializes each of the 9 shifted tap windows (observed: 24 MB ask at
# tile_h=8, full 1120-px width) — raise the per-kernel limit; v5e has
# 128 MB of physical VMEM and this kernel is the only resident.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def _pad_input(x, th):
    """Spatial pad for the stencil: 1 px halo each side, H rounded to the
    row tile, and W rounded so the padded width is a multiple of 8 —
    Mosaic requires HBM DMA slice extents tile-aligned on the sublane
    (W) dim ("Slice shape along dimension 2 must be aligned to tiling").
    The stencil only ever reads cols [0, wd+2), so the extra right-pad
    columns are dead weight in the window, never in the output."""
    b, h, wd, c = x.shape
    pad_h = (-h) % th
    pad_w = (-(wd + 2)) % 8
    xp = jnp.pad(x, ((0, 0), (1, 1 + pad_h), (1, 1 + pad_w), (0, 0)))
    return xp, h + pad_h


def _halo_specs(th, wp, c):
    """Main th-row block over the padded input + two 1-row halo blocks
    over the pre-sliced halo tensors from _halo_rows (all Blocked,
    no aliased operands; window assembled in VMEM by _window).

    Blocks span the FULL padded width wp: Mosaic requires the last two
    block dims to be (8, 128)-divisible OR equal to the array dims, and
    wd+2 (e.g. 1122 at the 1120-px serving width) is neither while wp
    is 8-aligned by _pad_input. The <=6 extra right-pad columns ride
    along in VMEM; the stencil never reads past col w_out+2."""
    return [
        pl.BlockSpec((1, th, wp, c),
                     lambda bi, i: (bi, i, 0, 0),  # rows [i*th, i*th+th)
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, wp, c),
                     lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, wp, c),
                     lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _halo_rows(xp, th):
    """Tile i's two halo rows (padded rows i*th+th and i*th+th+1) as
    separate (B, H/th, Wp, C) tensors — tiny strided-slice copies that
    replace round 3's two full-tensor de-alias copies."""
    h1 = xp[:, th::th]
    h2 = xp[:, th + 1::th]
    return h1, h2


def dwconv3x3(x, w, act=None, tile_h=8, interpret=None):
    """Depthwise 3x3, stride 1, padding 1, bias-free, NHWC, multiplier 1.

    x: (B, H, W, C); w: (3, 3, 1, C) HWIO.
    act: None | 'gelu' | 'leaky' fused on the output.
    """
    b, h, wd, c = x.shape
    assert w.shape == (3, 3, 1, c), (w.shape, c)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    th = tile_h
    xp, hp = _pad_input(x, th)
    h1, h2 = _halo_rows(xp, th)
    kern = functools.partial(_dw_kernel, th=th, w_out=wd, act=act)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, hp, wd, c), x.dtype),
        grid=(b, hp // th),
        in_specs=_halo_specs(th, xp.shape[2], c) + [
            pl.BlockSpec((9, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wd, c), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(xp, h1, h2, w.reshape(9, c))
    return out[:, :h]


def gate_perm(c):
    """Channel permutation the gate kernel emits: position p holds torch
    gate channel perm[p]. Fold into the consumer's 1x1 weight via
    w_folded = w[gate_perm(c)] so matmul(kernel_out, w_folded) ==
    matmul(torch_gate_out, w)."""
    import numpy as np
    c2 = c // 2
    perm = np.empty(c, np.int64)
    perm[:c2] = 2 * np.arange(c2)        # u[i] = gate[2i]
    perm[c2:] = 2 * np.arange(c2) + 1    # v[i] = gate[2i+1]
    return perm


def dwconv3x3_gate(x, w, tile_h=8, interpret=None):
    """The reference's dwconv(C -> 2C, groups=C) + chunk(2) + gelu(g1)*g2
    (FDN_arch.py:455,470-472), one VMEM pass: reads x once (C wide),
    writes the gated C-wide result in `gate_perm` channel order.

    x: (B, H, W, C) with C even; w: (3, 3, 1, 2C) torch grouped order
    (output o uses input o//2).
    """
    b, h, wd, c = x.shape
    assert c % 2 == 0 and w.shape == (3, 3, 1, 2 * c), (w.shape, c)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    th = tile_h
    xp, hp = _pad_input(x, th)
    h1, h2 = _halo_rows(xp, th)
    wk = w.reshape(9, 2 * c)
    wa = wk[:, 0::2]   # even outputs: a[i] = g_full[2i], uses input i
    wb = wk[:, 1::2]   # odd outputs
    kern = functools.partial(_dw_gate_kernel, th=th, w_out=wd, cin=c)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, hp, wd, c), x.dtype),
        grid=(b, hp // th),
        in_specs=_halo_specs(th, xp.shape[2], c) + [
            pl.BlockSpec((9, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wd, c), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(xp, h1, h2, wa, wb)
    return out[:, :h]
