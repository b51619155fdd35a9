"""Pallas TPU kernels: fused 8x8-patch frequency pipelines.

The FDSA/FDFFN inner loops are chains of
  patch-rFFT -> denormal clamp -> amp/phase algebra -> patch-irFFT
which, expressed as XLA einsums, materialize ~6-10 full-size HBM tensors
per block. These kernels run the whole chain in VMEM per patch tile: one
read of the patched input, one write of the output. The DFTs are the
combined (80, 64) / (64, 80) real matmuls from ops.fourier (torch-parity
semantics, hermitian expansion folded into the inverse).

Layout: patches (N, 64, C) where N = B * (H/8) * (W/8) — produced by the
free leading-dim merges after ops.fourier.patchify8. Params enter as
(40, C) planes. Grid tiles N; N must be a multiple of the tile (callers
pad).

These are inference-path fusions, enabled with FDN_PALLAS=1; training
uses the XLA path (ops.fourier), which is fully differentiable.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fdn_tip2025_tpu.ops.fourier import _dft_combined_np

THRESH = 1e-10


def _clamp(v):
    return jnp.where((v < THRESH) & (v > -THRESH), THRESH, v)


def _mats(dtype):
    W, A = _dft_combined_np()
    return jnp.asarray(W, dtype), jnp.asarray(A, dtype)


# ---------------------------------------------------------------------------
# FDFFN: spectrum rotation
# ---------------------------------------------------------------------------

def _fdffn_kernel(x_ref, cr_ref, sr_ref, w_ref, a_ref, o_ref, *, dtype):
    W, A = w_ref[:], a_ref[:]
    x = x_ref[:]  # (TP, 64, C)
    f = jax.lax.dot_general(
        x, W, (((1,), (1,)), ((), ())),
        preferred_element_type=dtype)  # (TP, C, 80)
    pr = _clamp(f[:, :, :40])
    pi = _clamp(f[:, :, 40:])
    cr = cr_ref[:].T  # (C, 40)
    sr = sr_ref[:].T
    rr = pr * cr + pi * sr
    ii = pi * cr - pr * sr
    mod = jnp.concatenate([rr, ii], axis=-1)  # (TP, C, 80)
    out = jax.lax.dot_general(
        mod, A, (((2,), (1,)), ((), ())),
        preferred_element_type=dtype)  # (TP, C, 64)
    o_ref[:] = out.transpose(0, 2, 1)


def fdffn_freq(patches, cr, sr, tile=16):
    """patches: (N, 64, C); cr, sr: (40, C) rotation planes.

    Returns (N, 64, C) = irfft(rotate(clamp(rfft(patches)))).
    """
    n, _, c = patches.shape
    pad = (-n) % tile
    if pad:
        patches = jnp.pad(patches, ((0, pad), (0, 0), (0, 0)))
    grid = (patches.shape[0] // tile,)
    W, A = _mats(patches.dtype)
    out = pl.pallas_call(
        functools.partial(_fdffn_kernel, dtype=patches.dtype),
        out_shape=jax.ShapeDtypeStruct(patches.shape, patches.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 64, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((40, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((40, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((80, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 80), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 64, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(patches, cr, sr, W, A)
    return out[:n] if pad else out


# ---------------------------------------------------------------------------
# FDSA: q/k/v spectral attention
# ---------------------------------------------------------------------------

def _fdsa_kernel(q_ref, k_ref, v_ref, fft_ref, w_ref, a_ref,
                 o1_ref, o2_ref, o3_ref, *, dtype):
    W, A = w_ref[:], a_ref[:]

    def dft(x):
        f = jax.lax.dot_general(x, W, (((1,), (1,)), ((), ())),
                                preferred_element_type=dtype)
        return f[:, :, :40], f[:, :, 40:]  # (TP, C, 40) re/im

    qr, qi = dft(q_ref[:])
    kr, ki = dft(k_ref[:])
    vr, vi = dft(v_ref[:])
    fft_p = fft_ref[:].T  # (C, 40)
    vr, vi = _clamp(vr * fft_p), _clamp(vi * fft_p)

    qk_re = _clamp(qr * kr - qi * ki)
    qk_im = _clamp(qr * ki + qi * kr)
    qka = jnp.sqrt(qk_re * qk_re + qk_im * qk_im)

    qr, qi = _clamp(qr), _clamp(qi)
    kr, ki = _clamp(kr), _clamp(ki)
    v_a = jnp.sqrt(vr * vr + vi * vi)
    qn = jnp.sqrt(qr * qr + qi * qi)
    kn = jnp.sqrt(kr * kr + ki * ki)
    qck_r = qr * kr + qi * ki
    qck_i = qi * kr - qr * ki
    inv_qk = 1.0 / (qn * kn)
    s1 = v_a * inv_qk
    s2 = qka / v_a
    s3 = qka * inv_qk

    def idft(rr, ii, o_ref):
        mod = jnp.concatenate([rr, ii], axis=-1)
        out = jax.lax.dot_general(mod, A, (((2,), (1,)), ((), ())),
                                  preferred_element_type=dtype)
        o_ref[:] = out.transpose(0, 2, 1)

    idft(s1 * qck_r, s1 * qck_i, o1_ref)
    idft(s2 * vr, s2 * vi, o2_ref)
    idft(s3 * qck_r, s3 * qck_i, o3_ref)


def _fdsa_chain_kernel(q_ref, k_ref, v_ref, fftT_ref, a_ref,
                       o_ref, *, dtype):
    """Per-channel fused FDSA spectral chain.

    Grid (E, n_tiles); blocks are single-channel (1, 80|64, NT) planes, so
    every matmul is a plain 2-D `dot_general` and every elementwise op is
    2-D — the only forms the tunneled remote compile helper accepts
    (batched tpu.matmul and sublane-merge reshapes HTTP-500, see
    OPTIMIZATIONS.md "Lane-major Pallas blocked").

    Inputs are the POST-DFT spectra rows of t = (3E, 80, N) (XLA keeps its
    efficient patchify-fused forward-DFT einsum); the kernel fuses the
    whole amp/phase algebra (reference FDN_arch.py:599-630, trig-free
    identities as in nn/attention.py) plus the three inverse DFTs, writing
    each (E, 64, N) output once. Chain math runs in f32 registers.
    """
    f32 = jnp.float32
    q = q_ref[0].astype(f32)                  # (80, NT)
    k = k_ref[0].astype(f32)
    v = v_ref[0].astype(f32)
    qr, qi = q[:40], q[40:]
    kr, ki = k[:40], k[40:]
    fp = fftT_ref[0, :, 0:1].astype(f32)      # (40, 1) — this channel's row
    vr = _clamp(v[:40] * fp)
    vi = _clamp(v[40:] * fp)

    qk_im = _clamp(qr * ki + qi * kr)
    qk_re = _clamp(qr * kr - qi * ki)
    qka = jnp.sqrt(qk_re * qk_re + qk_im * qk_im)

    qr, qi = _clamp(qr), _clamp(qi)
    kr, ki = _clamp(kr), _clamp(ki)
    v_a = jnp.sqrt(vr * vr + vi * vi)
    qn = jnp.sqrt(qr * qr + qi * qi)
    kn = jnp.sqrt(kr * kr + ki * ki)
    qck_r = qr * kr + qi * ki
    qck_i = qi * kr - qr * ki
    inv_qk = 1.0 / (qn * kn)
    s1 = v_a * inv_qk
    s2 = qka / v_a
    s3 = qka * inv_qk

    A = a_ref[:]                              # (64, 80)

    def idft(rr, ii, slot):
        cat = jnp.concatenate([rr, ii], axis=0).astype(dtype)
        o_ref[slot, 0] = jax.lax.dot_general(
            A, cat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)

    idft(s1 * qck_r, s1 * qck_i, 0)
    idft(s2 * vr, s2 * vi, 1)
    idft(s3 * qck_r, s3 * qck_i, 2)


def _fdffn_rot_kernel(x_ref, cs_ref, a_ref, o_ref, *, dtype):
    """Per-channel fused FDFFN spectrum rotation + inverse DFT.

    Same grid/block scheme as _fdsa_chain_kernel. cs_ref carries this
    channel's cos row (sublanes 0..39) and sin row (40..79).
    """
    f32 = jnp.float32
    f = x_ref[0].astype(f32)                  # (80, NT)
    pr = _clamp(f[:40])
    pi = _clamp(f[40:])
    cs = cs_ref[0, :, 0:1].astype(f32)        # (80, 1)
    cr, sr = cs[:40], cs[40:]
    rr = pr * cr + pi * sr
    ii = pi * cr - pr * sr
    cat = jnp.concatenate([rr, ii], axis=0).astype(dtype)
    o_ref[0] = jax.lax.dot_general(
        a_ref[:], cat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)


def fdffn_rot_cm(t, cr40, sr40, tile=1408):
    """Fused FDFFN rotation on channel-major spectra.

    t: (C, 80, N) half-spectra; cr40/sr40: (40, C) rotation planes
    (ffta*cos(fftp) / ffta*sin(fftp)). Returns (C, 64, N) =
    irfft(rotate(clamp(spectra))) matching nn/ffn.py's XLA p40 chain.
    """
    c, _, n = t.shape
    nt = min(tile, ((n + 127) // 128) * 128)
    grid = (c, pl.cdiv(n, nt))
    _, A = _mats(t.dtype)
    cs = jnp.broadcast_to(
        jnp.concatenate([jnp.asarray(cr40, t.dtype),
                         jnp.asarray(sr40, t.dtype)], axis=0)
        .T[:, :, None], (c, 80, 8))
    return pl.pallas_call(
        functools.partial(_fdffn_rot_kernel, dtype=t.dtype),
        out_shape=jax.ShapeDtypeStruct((c, 64, n), t.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 80, nt), lambda ci, i: (ci, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 80, 8), lambda ci, i: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 80), lambda ci, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 64, nt), lambda ci, i: (ci, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(t, cs, A)


def fdsa_chain_cm(t, fft40, tile=2816):
    """Fused FDSA spectral chain on channel-major spectra.

    t: (3E, 80, N) stacked q/k/v half-spectra (re rows 0..39, im 40..79);
    fft40: (40, E) learnable filter bins (row-major (8,5) order, i.e.
    params["fft"].reshape(40, E)). Returns outs (3E, 64, N) in the same
    [out1; out2; out3] row order as the XLA chain's concatenated inverse
    DFT, so the downstream LN/gate/proj is unchanged (chain math in f32
    instead of the array dtype; decision-grade equality is the
    trained-weights cross-PSNR).
    """
    c3, eighty, n = t.shape
    e = c3 // 3
    nt = min(tile, ((n + 127) // 128) * 128)
    grid = (e, pl.cdiv(n, nt))
    _, A = _mats(t.dtype)
    # per-channel fft rows delivered via BlockSpec (dynamic lane indexing
    # is not provable for Mosaic): (E, 40, 8) with block (1, 40, 8)
    fftT = jnp.broadcast_to(
        jnp.asarray(fft40, t.dtype).T[:, :, None], (e, 40, 8))

    def row(off):
        return pl.BlockSpec((1, 80, nt), lambda c, i, o=off: (o + c, 0, i),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_fdsa_chain_kernel, dtype=t.dtype),
        out_shape=jax.ShapeDtypeStruct((3, e, 64, n), t.dtype),
        grid=grid,
        in_specs=[
            row(0), row(e), row(2 * e),
            pl.BlockSpec((1, 40, 8), lambda c, i: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 80), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 1, 64, nt), lambda c, i: (0, c, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(t, t, t, fftT, A)
    return out.reshape(c3, 64, n)


def _fdsa_block_kernel(t_ref, fft_ref, vv_ref, ln_ref, a_ref, pw_ref,
                       o_ref, *, e, dtype, has_bias, interp=False):
    """Whole-FDSA-tail kernel: spectra algebra + 3 batched inverse DFTs +
    cross-channel LayerNorm + v_value gate, one VMEM pass.

    Grid tiles N only; the FULL channel dim lives in the block so the
    LayerNorm reduction over C runs in registers. The inverse DFTs are
    batched `dot_general`s over C and the projection stays in XLA (it
    consumes the (3E, 64, N) output directly). This kernel replaces the
    XLA chain's materialized cat/irfft/LN/gate segments (~0.9 GB/block
    of HBM traffic at level 1). Requires the batched-matmul Mosaic form
    (HTTP-500'd in earlier rounds; re-probed working — OPTIMIZATIONS.md
    round-4).
    """
    f32 = jnp.float32
    t = t_ref[...]                                # (3E, 80, NT)
    qr = t[:e, :40].astype(f32)
    qi = t[:e, 40:].astype(f32)
    kr = t[e:2 * e, :40].astype(f32)
    ki = t[e:2 * e, 40:].astype(f32)
    fp = fft_ref[:, :, 0:1].astype(f32)           # (E, 40, 1)
    vr = _clamp(t[2 * e:, :40].astype(f32) * fp)
    vi = _clamp(t[2 * e:, 40:].astype(f32) * fp)

    qk_im = _clamp(qr * ki + qi * kr)
    qk_re = _clamp(qr * kr - qi * ki)
    qka = jnp.sqrt(qk_re * qk_re + qk_im * qk_im)

    qr, qi = _clamp(qr), _clamp(qi)
    kr, ki = _clamp(kr), _clamp(ki)
    v_a = jnp.sqrt(vr * vr + vi * vi)
    qn = jnp.sqrt(qr * qr + qi * qi)
    kn = jnp.sqrt(kr * kr + ki * ki)
    qck_r = qr * kr + qi * ki
    qck_i = qi * kr - qr * ki
    inv_qk = 1.0 / (qn * kn)
    s1 = v_a * inv_qk
    s2 = qka / v_a
    s3 = qka * inv_qk

    # interpret mode (CPU tests): the CPU dot thunk rejects
    # bf16 x bf16 -> f32, so upcast operands there (a strict precision
    # superset of the TPU bf16 MXU pass; tolerances absorb it)
    dot_t = f32 if interp else dtype
    A = a_ref[:]                                  # (64, 80), dtype
    Ab = jnp.broadcast_to(A[None], (e,) + A.shape).astype(dot_t)
    vv = vv_ref[...]                              # (E, 64, NT)

    def tail(rr, ii, slot):
        # bf16 cast before the inverse DFT matches the XLA chain
        # (nn/attention.py casts cat_r/cat_i to the array dtype).
        cat = jnp.concatenate([rr, ii], axis=1).astype(dtype).astype(dot_t)
        o = jax.lax.dot_general(
            Ab, cat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)           # (E, 64, NT) f32
        # (E, 64, 1) slices of the pre-broadcast (6, E, 64, 8) param
        # block: Mosaic rejects the (E,) -> (E,1,1) reshape
        # ("unsupported shape cast", probed round-4), lane-slicing a
        # wider input is the supported spelling.
        w = ln_ref[slot][:, :, 0:1].astype(f32)
        mu = jnp.mean(o, axis=0, keepdims=True)
        var = jnp.mean(o * o, axis=0, keepdims=True) - mu * mu
        if has_bias:
            b = ln_ref[3 + slot][:, :, 0:1].astype(f32)
            ln = ((o - mu) * jax.lax.rsqrt(var + 1e-5) * w + b)
        else:
            ln = o * jax.lax.rsqrt(var + 1e-5) * w
        gated = (ln.astype(dtype) * vv).astype(dot_t)
        # fold the 1x1 projection: contraction over C keeps the written
        # block at (dim, 64, NT) instead of (3E, 64, NT)
        return jax.lax.dot_general(
            pw_ref[slot].astype(dot_t), gated, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    acc = tail(s1 * qck_r, s1 * qck_i, 0)
    acc = acc + tail(s2 * vr, s2 * vi, 1)
    acc = acc + tail(s3 * qck_r, s3 * qck_i, 2)
    o_ref[...] = acc.astype(dtype)


def fdsa_block_cm(t, fft40, vv, ln_w, ln_b, proj_w, tile=None):
    """Fused FDSA tail on channel-major spectra, full-C blocks.

    t: (3E, 80, N) stacked q/k/v half-spectra; fft40: (40, E) filter;
    vv: (E, 64, N) v_value patches; ln_w: [w1, w2, w3] each (E,);
    ln_b: [b1, b2, b3] each (E,) or all None (BiasFree); proj_w: the
    1x1 projection weight (3E, dim).
    Returns (dim, 64, N) = proj(concat_i(vv * LN_i(irfft(out_i)))) —
    the XLA tail's post-projection tensor minus the bias
    (nn/attention.py _fdsa_cm_tail; bias stays in XLA).
    """
    c3, _, n = t.shape
    e = c3 // 3
    if tile is None:
        tile = int(__import__('os').environ.get('FDN_PALLAS_BLOCK_NT',
                                                '512'))
    # VMEM budget: the f32 working set scales with c3 * nt; cap the tile
    # so ~24 MB of f32 intermediates fit alongside the bf16 blocks
    # (level 1 E=38 -> 512, level 2 E=76 -> 256, level 3 E=153 -> 128).
    # measured stack use ~72 KB per lane column at c3=114 (compiler
    # error message, round-4); size the tile for a ~48 MB stack and lift
    # the kernel's scoped-vmem limit accordingly (the 16 MB default
    # rejects even nt=256 at level 1).
    budget = int(float(__import__('os').environ.get('FDN_PALLAS_BLOCK_VMEM', '24e6')) // (c3 * 80 * 4)) // 128 * 128
    nt = max(128, min(tile, ((n + 127) // 128) * 128, budget))
    grid = (pl.cdiv(n, nt),)
    _, A = _mats(t.dtype)
    fftb = jnp.broadcast_to(
        jnp.asarray(fft40, t.dtype).T[:, :, None], (e, 40, 8))
    has_bias = ln_b[0] is not None
    rows = list(ln_w) + (list(ln_b) if has_bias else list(ln_w))
    ln = jnp.stack([r.astype(t.dtype) for r in rows])  # (6, E)
    ln = jnp.broadcast_to(ln[:, :, None, None], (6, e, 64, 8))
    dim = proj_w.shape[-1]
    pw = jnp.stack([proj_w[:e], proj_w[e:2 * e], proj_w[2 * e:]]
                   ).astype(t.dtype)                   # (3, E, dim)
    interp = jax.default_backend() == "cpu"
    return pl.pallas_call(
        functools.partial(_fdsa_block_kernel, e=e, dtype=t.dtype,
                          has_bias=has_bias, interp=interp),
        out_shape=jax.ShapeDtypeStruct((dim, 64, n), t.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((c3, 80, nt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e, 40, 8), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e, 64, nt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, e, 64, 8), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 80), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, e, dim), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dim, 64, nt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(t, fftb, vv, ln, A, pw)


def fdsa_freq(q, k, v, fft_p, tile=4):
    """q, k, v: (N, 64, E) patches; fft_p: (40, E).

    Returns (out1, out2, out3), each (N, 64, E) — the three spectral
    combinations of FDN_arch.py:599-630 with reference clamp placement.
    """
    n, _, e = q.shape
    pad = (-n) % tile
    if pad:
        q, k, v = (jnp.pad(t, ((0, pad), (0, 0), (0, 0)))
                   for t in (q, k, v))
    grid = (q.shape[0] // tile,)
    blk = pl.BlockSpec((tile, 64, e), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    pblk = pl.BlockSpec((40, e), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    W, A = _mats(q.dtype)
    wblk = pl.BlockSpec((80, 64), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    ablk = pl.BlockSpec((64, 80), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    o1, o2, o3 = pl.pallas_call(
        functools.partial(_fdsa_kernel, dtype=q.dtype),
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[blk, blk, blk, pblk, wblk, ablk],
        out_specs=(blk, blk, blk),
        interpret=jax.default_backend() == "cpu",
    )(q, k, v, fft_p, W, A)
    if pad:
        return o1[:n], o2[:n], o3[:n]
    return o1, o2, o3
