"""FDSA — Fourier-domain self-attention over 8x8 patches.

Parity: reference FDN_arch.py:556-641. The per-patch rFFT/irFFT round trips
are DFT matmuls (ops.fourier), so the whole block is conv + matmul + VPU
elementwise — no complex dtype, fully MXU/XLA-fusable and differentiable.

Computation (all on 8x8 patch half-spectra):
  q, k, v, v_value = dwconv(1x1(x)).chunk(4)
  V   = rfft(v) * fft_param;  V = denormal-clamp(V)
  QK  = rfft(q) * rfft(k);    QK = denormal-clamp(QK)
  phase_qk = angle(clamp(Q)) - angle(clamp(K))
  out1 = irfft(polar(|V|,  phase_qk))
  out2 = irfft(polar(|QK|, angle(V)))
  out3 = irfft(polar(|QK|, phase_qk))
  out  = 1x1(concat(v_value * LN_i(out_i)))
"""

import os

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.ops import (
    conv2d, init_conv2d, layer_norm_2d, layer_norm_cm, init_layer_norm,
    patchify8, unpatchify8, replace_denormals,
    from_patches_cm, irfft2_patch8_cm, param_cm,
)
from fdn_tip2025_tpu.ops.fourier import amp_phase_ri, polar_ri

INNER = 4  # q, k, v, v_value


def init_fdsa(key, dim, bias=False):
    expand = int(dim * 1.2)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "to_hidden": init_conv2d(k1, 1, 1, dim, expand * INNER, bias=bias),
        "to_hidden_dw": init_conv2d(k2, 3, 3, expand * INNER, expand * INNER,
                                    groups=expand * INNER, bias=bias),
        "project_out": init_conv2d(k3, 1, 1, expand * 3, dim, bias=bias),
        "norm1": {"body": init_layer_norm(expand)},
        "norm2": {"body": init_layer_norm(expand)},
        "norm3": {"body": init_layer_norm(expand)},
        # torch shape (expand, 1, 1, 8, 5) -> ours (8, 5, expand)
        "fft": jnp.ones((8, 5, expand), jnp.float32),
    }


def _ln(p, x):
    return layer_norm_2d(x, p["body"]["weight"], p["body"]["bias"])


def fdsa(params, x):
    expand4 = params["to_hidden"]["weight"].shape[-1]
    expand = expand4 // INNER
    hidden = conv2d(x, params["to_hidden"]["weight"],
                    params["to_hidden"].get("bias"))
    if os.environ.get("FDN_PALLAS") == "1":
        hidden = conv2d(hidden, params["to_hidden_dw"]["weight"],
                        params["to_hidden_dw"].get("bias"),
                        padding=1, groups=expand4)
        v_value = hidden[..., 3 * expand:]
        q = hidden[..., :expand]
        k = hidden[..., expand:2 * expand]
        v = hidden[..., 2 * expand:3 * expand]
        from fdn_tip2025_tpu.kernels.patch_freq import fdsa_freq
        b, hh, ww, _ = q.shape
        qp = patchify8(q).reshape(-1, 64, expand)
        kp = patchify8(k).reshape(-1, 64, expand)
        vp = patchify8(v).reshape(-1, 64, expand)
        fft_plane = params["fft"].reshape(40, expand)
        o1, o2, o3 = fdsa_freq(qp, kp, vp, fft_plane)

        def unpatch(o):
            return unpatchify8(o.reshape(b, hh // 8, ww // 8, 8, 8,
                                         expand))

        out1 = _ln(params["norm1"], unpatch(o1))
        out2 = _ln(params["norm2"], unpatch(o2))
        out3 = _ln(params["norm3"], unpatch(o3))
        out = jnp.concatenate(
            [v_value * out1, v_value * out2, v_value * out3], axis=-1)
        return conv2d(out, params["project_out"]["weight"],
                      params["project_out"].get("bias"))

    # Channel-major spectral core. The spectral algebra runs on dense
    # (C, 40|64, Npatch) planes: 40/64 sublanes tile exactly, N fills the
    # lanes, q/k/v splits are free major-axis views, and the DFT matmuls
    # and elementwise chain share one {2,1,0} layout. The previous NHWC
    # (..., 8, 5, 38) spectra tile-padded 5.4x and spent most of FDSA in
    # layout copies/lane slices; measured on v5e at 1120x640 this path is
    # 31.2 -> 23.2 ms isolated, +9% on the full forward (OPTIMIZATIONS.md
    # round-2 "channel-major spectral core").
    #
    # Entry into the layout costs no explicit big transpose:
    #   * q|k|v and v_value get SEPARATE depthwise convs (exact split: the
    #     dwconv is per-channel, so slicing its kernel == slicing its
    #     output) so each patchify feeds exactly one einsum and XLA fuses
    #     the patch gather into the matmul;
    #   * the DFT einsum emits (..., 80, C) and ONE spectra-sized
    #     transpose lands channel-major;
    #   * v_value rides an identity matmul (the MXU does the relayout).
    from fdn_tip2025_tpu.ops.fourier import (
        _dft_combined, _patch_dft_precision)
    import numpy as _np
    dwk = params["to_hidden_dw"]["weight"]
    dwb = params["to_hidden_dw"].get("bias")
    c3 = 3 * expand
    if (os.environ.get("FDN_FDSA_DENSE") == "1" and dwb is None
            and params["to_hidden"].get("bias") is None):
        # Entry fold: dw3x3(conv1x1(x)) == dense 3x3 conv with kernel
        # K[dy,dx,i,c] = w1[i,c] * dwk[dy,dx,c] (exact with zero bias —
        # zero-padding commutes because 1x1 of 0 is 0). Skips the 4E-wide
        # `hidden` HBM round trip and the grouped-conv lowering; costs
        # ~7x the entry FLOPs, but on the MXU those are cheap. The
        # journal's round-4 profile put the serial critical path at this
        # conv entry — this trades its bytes for matmul work.
        w1 = params["to_hidden"]["weight"][0, 0]          # (dim, 4E)
        K = dwk * w1[None, None]                          # (3,3,dim,4E)
        h_qkv = conv2d(x, K[..., :c3], None, padding=1)
        h_vv = conv2d(x, K[..., c3:], None, padding=1)
    else:
        from fdn_tip2025_tpu.kernels.dwconv import dwconv3x3, use_pallas_dw
        if use_pallas_dw(hidden, dwb):
            # Pallas stencil dwconvs (kernels/dwconv.py) — see the FDFFN
            # note; exact per-channel split of the kernel as before
            h_qkv = dwconv3x3(hidden[..., :c3], dwk[..., :c3])
            h_vv = dwconv3x3(hidden[..., c3:], dwk[..., c3:])
        else:
            h_qkv = conv2d(hidden[..., :c3], dwk[..., :c3],
                           None if dwb is None else dwb[:c3],
                           padding=1, groups=c3)
            h_vv = conv2d(hidden[..., c3:], dwk[..., c3:],
                          None if dwb is None else dwb[c3:],
                          padding=1, groups=expand)
    b, hh, ww, _ = h_qkv.shape
    n_p = b * (hh // 8) * (ww // 8)
    prec = _patch_dft_precision(h_qkv.dtype)
    Wc, _ = _dft_combined(str(h_qkv.dtype))
    eye = jnp.asarray(_np.eye(64, dtype=_np.float32), h_qkv.dtype)
    flat = patchify8(h_qkv).reshape(b, hh // 8, ww // 8, 64, c3)
    f = jnp.einsum("fk,bijkc->bijfc", Wc, flat, precision=prec)
    t = f.transpose(4, 3, 0, 1, 2).reshape(c3, 80, n_p)
    fr, fi = t[:, :40], t[:, 40:]
    vflat = patchify8(h_vv).reshape(b, hh // 8, ww // 8, 64, expand)
    vv = jnp.einsum("fk,bijkc->bijfc", eye, vflat, precision=prec)
    v_value_p = vv.transpose(4, 3, 0, 1, 2).reshape(expand, 64, n_p)

    if (os.environ.get("FDN_PALLAS_BLOCK") == "1"
            and h_qkv.dtype == jnp.bfloat16):
        # Whole-tail kernel (round-4): algebra + batched inverse DFTs +
        # cross-channel LN + v_value gate in one VMEM pass
        # (kernels/patch_freq.fdsa_block_cm); only the projection einsum
        # stays in XLA. Unblocked by the batched-matmul Mosaic form the
        # compile helper previously rejected.
        from fdn_tip2025_tpu.kernels.patch_freq import fdsa_block_cm
        n1, n2, n3 = (params["norm1"]["body"], params["norm2"]["body"],
                      params["norm3"]["body"])
        proj = fdsa_block_cm(
            t, params["fft"].reshape(40, expand), v_value_p,
            [n1["weight"], n2["weight"], n3["weight"]],
            [n1.get("bias"), n2.get("bias"), n3.get("bias")],
            params["project_out"]["weight"][0, 0])
        pb = params["project_out"].get("bias")
        if pb is not None:
            proj = proj + pb.reshape((-1,) + (1,) * (proj.ndim - 1))
        return from_patches_cm(proj, b, hh, ww)

    if (os.environ.get("FDN_PALLAS_CM") == "1"
            and h_qkv.dtype == jnp.bfloat16):
        # Fused Pallas chain: spectra t -> algebra -> 3 inverse DFTs in
        # one VMEM pass (kernels/patch_freq.fdsa_chain_cm) — replaces the
        # elementwise-fusion/copy tail between the two DFT matmuls. The
        # stacked (3E, 64, N) output feeds the same LN/gate/proj tail as
        # the XLA chain below.
        from fdn_tip2025_tpu.kernels.patch_freq import fdsa_chain_cm
        # barrier: stop the pallas operand-layout requirement from
        # propagating into the conv/patchify entry (measured: without it
        # XLA re-lays the 1x1/dw convs into T(2,128) tiles, +4 ms/block)
        t = jax.lax.optimization_barrier(t)
        outs = fdsa_chain_cm(t, params["fft"].reshape(40, expand))
        return _fdsa_cm_tail(params, outs, v_value_p, expand, prec,
                             b, hh, ww)

    dt = t.dtype
    cat_r, cat_i = _spectral_combine(fr, fi, params["fft"], expand, dt)
    outs = irfft2_patch8_cm(cat_r.astype(dt), cat_i.astype(dt))
    # (3E, 64, N)
    return _fdsa_cm_tail(params, outs, v_value_p, expand, prec, b, hh, ww)


def _spectral_combine(fr, fi, fft_param, expand, dt):
    """The FDSA spectral algebra on channel-major half-spectra.

    fr/fi: (3E, 40, ...) stacked q|k|v spectra. Returns (cat_r, cat_i),
    each (3E, 40, ...) — the three outputs' spectra concatenated on the
    major axis, ready for one inverse DFT. Shared by the NHWC fdsa() and
    the NCHW block variant (nn/cm_block.py).
    """
    if (dt == jnp.bfloat16
            and os.environ.get("FDN_BF16_PHASE_F32", "0") == "1"):
        # Opt-in f32 island for the phase algebra (default OFF, measured:
        # costs 4% serving throughput — 0.768 vs 0.802 MP/s — while the
        # bf16 error is dominated by the rounded bf16 spectra themselves,
        # not the algebra: max-rel 0.0623 vs 0.0621 with the island.
        # OPTIMIZATIONS.md round-3 "f32 phase-algebra island").
        fr, fi = fr.astype(jnp.float32), fi.astype(jnp.float32)
    qr, qi = fr[:expand], fi[:expand]
    kr, ki = fr[expand:2 * expand], fi[expand:2 * expand]
    vr, vi = fr[2 * expand:], fi[2 * expand:]

    fft_p = param_cm(fft_param, ndim=fr.ndim)   # (E, 40, 1...)
    vr, vi = vr * fft_p, vi * fft_p
    vr, vi = replace_denormals((vr, vi))

    qkr = qr * ki + qi * kr  # imag of q*k (clamped below)
    qk_re = qr * kr - qi * ki
    qk_re, qkr = replace_denormals((qk_re, qkr))
    qka = jnp.sqrt(qk_re * qk_re + qkr * qkr)

    # Trig-free reformulation (exact identities on the clamped values;
    # the reference routes through atan2/cos/sin — FDN_arch.py:599-630 —
    # which costs 3 transcendentals per bin on the VPU):
    #   polar(a, angle(q)-angle(k)) = a * q*conj(k) / (|q||k|)
    #   polar(a, angle(v))          = a * v / |v|
    qr, qi = replace_denormals((qr, qi))
    kr, ki = replace_denormals((kr, ki))
    v_a = jnp.sqrt(vr * vr + vi * vi)
    qn = jnp.sqrt(qr * qr + qi * qi)
    kn = jnp.sqrt(kr * kr + ki * ki)
    qck_r = qr * kr + qi * ki   # Re(q * conj(k))
    qck_i = qi * kr - qr * ki   # Im(q * conj(k))
    inv_qknorm = 1.0 / (qn * kn)
    s1 = v_a * inv_qknorm
    s2 = qka / v_a
    s3 = qka * inv_qknorm

    # one inverse DFT for all three outputs (major-axis concat is dense)
    cat_r = jnp.concatenate([s1 * qck_r, s2 * vr, s3 * qck_r], axis=0)
    cat_i = jnp.concatenate([s1 * qck_i, s2 * vi, s3 * qck_i], axis=0)
    return cat_r, cat_i


def _fdsa_cm_tail(params, outs, v_value_p, expand, prec, b, hh, ww,
                  out_layout="NHWC"):
    """Shared channel-major FDSA tail: per-output LN, v_value gate,
    1x1 projection, back to NHWC (or NCHW for the cm_block pipeline)."""
    n1, n2, n3 = (params["norm1"]["body"], params["norm2"]["body"],
                  params["norm3"]["body"])
    out = jnp.concatenate([
        v_value_p * layer_norm_cm(outs[:expand], n1["weight"],
                                  n1.get("bias")),
        v_value_p * layer_norm_cm(outs[expand:2 * expand], n2["weight"],
                                  n2.get("bias")),
        v_value_p * layer_norm_cm(outs[2 * expand:], n3["weight"],
                                  n3.get("bias")),
    ], axis=0)                               # (3E, 64, N)

    proj = jnp.einsum("co,ck...->ok...",
                      params["project_out"]["weight"][0, 0],
                      out,                   # (dim, 64, N)
                      precision=prec)
    pb = params["project_out"].get("bias")
    if pb is not None:
        proj = proj + pb.reshape((-1,) + (1,) * (proj.ndim - 1))
    if out_layout == "NCHW":
        from fdn_tip2025_tpu.ops.fourier import from_patches_cm_nchw
        return from_patches_cm_nchw(proj, b, hh, ww)
    return from_patches_cm(proj, b, hh, ww)
