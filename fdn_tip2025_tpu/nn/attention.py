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
    conv2d, init_conv2d, layer_norm_2d, init_layer_norm,
    patchify8, unpatchify8, rfft2_patch8, irfft2_patch8, replace_denormals,
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
    hidden = conv2d(hidden, params["to_hidden_dw"]["weight"],
                    params["to_hidden_dw"].get("bias"),
                    padding=1, groups=expand4)
    v_value = hidden[..., 3 * expand:]

    if os.environ.get("FDN_PALLAS") == "1":
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

    # one patchify + one DFT over the q|k|v channel block (3 transposes
    # and 3 DFT launches fused into 1+1). NOTE: a packed-lane variant
    # ((N, 40E) planes) was built and measured 145x SLOWER in situ — the
    # lane slices/flat reshapes break XLA's transpose-into-matmul fusion
    # (OPTIMIZATIONS.md round-2 "lane packing" entry).
    fr, fi = rfft2_patch8(patchify8(hidden[..., : 3 * expand]))
    qr, qi = fr[..., :expand], fi[..., :expand]
    kr, ki = fr[..., expand:2 * expand], fi[..., expand:2 * expand]
    vr, vi = fr[..., 2 * expand:], fi[..., 2 * expand:]

    fft_p = params["fft"]
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

    # one inverse DFT + one unpatchify for all three outputs
    cat_r = jnp.concatenate([s1 * qck_r, s2 * vr, s3 * qck_r], axis=-1)
    cat_i = jnp.concatenate([s1 * qck_i, s2 * vi, s3 * qck_i], axis=-1)
    outs = unpatchify8(irfft2_patch8(cat_r, cat_i))

    out1 = _ln(params["norm1"], outs[..., :expand])
    out2 = _ln(params["norm2"], outs[..., expand:2 * expand])
    out3 = _ln(params["norm3"], outs[..., 2 * expand:])

    out = jnp.concatenate(
        [v_value * out1, v_value * out2, v_value * out3], axis=-1)
    return conv2d(out, params["project_out"]["weight"],
                  params["project_out"].get("bias"))
