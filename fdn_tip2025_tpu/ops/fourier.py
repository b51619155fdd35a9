"""Fourier primitives: full-image rFFT2 and MXU-friendly 8x8 patch DFTs.

Semantics match the reference's torch.fft usage (parity targets cited per
function). Full-image transforms go through XLA's FFT (jnp.fft); the hot
8x8-patch transforms used by FDSA/FDFFN (reference
basicsr/models/archs/FDN_arch.py:571-632, 442-470) are implemented as real
matmuls against precomputed DFT matrices — no complex dtype, MXU-schedulable,
trivially differentiable, and fusable into Pallas kernels.

All tensors are NHWC. Spatial axes are (1, 2) unless noted.
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

# Norm convention: the reference always uses torch's default / explicit
# norm='backward' (forward unscaled, inverse scaled by 1/N). jnp.fft's
# default ("backward") is identical.


def rfft2(x, axes=(1, 2)):
    """2-D real FFT over the spatial axes of an NHWC tensor.

    Parity: torch.fft.rfft2(x_nchw, norm='backward') on the matching NCHW
    tensor (reference FDN_arch.py:411, 882-914 etc.).
    """
    return jnp.fft.rfft2(x, axes=axes)


def irfft2(x, s, axes=(1, 2)):
    """Inverse of :func:`rfft2`; `s` is the full spatial size (H, W)."""
    return jnp.fft.irfft2(x, s=s, axes=axes)


def replace_denormals(x, threshold=1e-10):
    """Clamp near-zero real/imag parts to +threshold, like the reference.

    The reference (FDN_arch.py:548-553) sets values strictly inside
    (-threshold, threshold) to +threshold (note: positive, asymmetric) on the
    real and imaginary parts independently, to stabilize torch.angle.
    Accepts a complex array or a (real, imag) tuple; returns same structure.
    """
    def clamp(v):
        return jnp.where((v < threshold) & (v > -threshold), threshold, v)

    if isinstance(x, tuple):
        return clamp(x[0]), clamp(x[1])
    return clamp(x.real) + 1j * clamp(x.imag)


def amp_phase(x):
    """Amplitude and phase of a complex array (torch.abs / torch.angle)."""
    return jnp.abs(x), jnp.angle(x)


def amp_phase_ri(re, im):
    """Amplitude and phase from separate real/imag planes (no complex dtype)."""
    return jnp.sqrt(re * re + im * im), jnp.arctan2(im, re)


def polar(amp, phase):
    """Complex array from amplitude/phase: amp * exp(i*phase)."""
    return amp * jnp.cos(phase) + 1j * (amp * jnp.sin(phase))


def polar_ri(amp, phase):
    """(real, imag) from amplitude/phase without complex dtype."""
    return amp * jnp.cos(phase), amp * jnp.sin(phase)


# ---------------------------------------------------------------------------
# 8x8 blockwise DFT as matmuls (the FDSA/FDFFN hot path)
# ---------------------------------------------------------------------------

PATCH = 8
_RFREQ = PATCH // 2 + 1  # 5


@lru_cache(maxsize=None)
def _dft_mats_np(dtype_name="float32"):
    """Precomputed real/imag DFT and inverse-DFT matrices for size 8.

    F[n, v] = exp(-2*pi*i*n*v/8)    (forward, rfft keeps v=0..4)
    E[m, u] = exp(+2*pi*i*m*u/8)/8  (inverse, per-axis normalized)

    Cached as NUMPY arrays: caching jnp arrays here would capture tracers
    when first touched inside a jit trace (UnexpectedTracerError).
    """
    n = np.arange(PATCH)
    ang = -2.0 * np.pi * np.outer(n, n) / PATCH
    dt = np.dtype(dtype_name)
    return (
        np.cos(ang).astype(dt), np.sin(ang).astype(dt),
        (np.cos(-ang) / PATCH).astype(dt), (np.sin(-ang) / PATCH).astype(dt),
    )


def _dft_mats(dtype_name="float32"):
    return tuple(jnp.asarray(a) for a in _dft_mats_np(dtype_name))


def patchify8(x):
    """(B, H, W, C) -> (B, H/8, W/8, 8, 8, C) blocks of 8x8 patches.

    Mirrors einops 'b c (h p1) (w p2) -> b c h w p1 p2' (FDN_arch.py:458,579)
    modulo the NHWC layout.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // PATCH, PATCH, w // PATCH, PATCH, c)
    return x.transpose(0, 1, 3, 2, 4, 5)


def unpatchify8(x):
    """Inverse of :func:`patchify8`."""
    b, hb, wb, p1, p2, c = x.shape
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hb * p1, wb * p2, c)


def rfft2_patch8(x):
    """rfft2 of each 8x8 patch via DFT matmuls.

    Input:  (..., 8, 8, C) real.
    Output: (real, imag), each (..., 8, 5, C).

    Parity: torch.fft.rfft2(patches, norm='backward') over the trailing
    8x8 patch dims (FDN_arch.py:460, 585-589).
    """
    fc, fs, _, _ = _dft_mats(str(x.dtype))
    fck = fc[:, :_RFREQ]
    fsk = fs[:, :_RFREQ]
    # Transform along the second patch axis (n -> v), keep 5 freqs.
    tr = jnp.einsum("...mnc,nv->...mvc", x, fck)
    ti = jnp.einsum("...mnc,nv->...mvc", x, fsk)
    # Transform along the first patch axis (m -> u), full 8.
    xr = jnp.einsum("um,...mvc->...uvc", fc, tr) - jnp.einsum(
        "um,...mvc->...uvc", fs, ti)
    xi = jnp.einsum("um,...mvc->...uvc", fc, ti) + jnp.einsum(
        "um,...mvc->...uvc", fs, tr)
    return xr, xi


def _expand_hermitian(xr, xi):
    """Rebuild the full (..., 8, 8, C) spectrum from rfft half-spectrum.

    X[u, v] for v in 5..7 equals conj(X[(8-u) % 8, 8-v]).
    """
    rev_r = jnp.roll(jnp.flip(xr, axis=-3), 1, axis=-3)
    rev_i = jnp.roll(jnp.flip(xi, axis=-3), 1, axis=-3)
    tail_r = rev_r[..., 3:0:-1, :]   # v = 3, 2, 1
    tail_i = -rev_i[..., 3:0:-1, :]
    return (
        jnp.concatenate([xr, tail_r], axis=-2),
        jnp.concatenate([xi, tail_i], axis=-2),
    )


def irfft2_patch8(xr, xi):
    """Inverse rfft2 of 8x8 patches from (real, imag) half-spectra.

    Input:  each (..., 8, 5, C). Output: (..., 8, 8, C) real.
    Parity: torch.fft.irfft2(X, s=(8, 8), norm='backward').
    """
    _, _, ec, es = _dft_mats(str(xr.dtype))
    fr, fi = _expand_hermitian(xr, xi)
    # x[m, n] = Re( sum_{u,v} X[u,v] E[m,u] E[n,v] )
    tr = jnp.einsum("...uvc,vn->...unc", fr, ec) - jnp.einsum(
        "...uvc,vn->...unc", fi, es)
    ti = jnp.einsum("...uvc,vn->...unc", fr, es) + jnp.einsum(
        "...uvc,vn->...unc", fi, ec)
    out = jnp.einsum("mu,...unc->...mnc", ec, tr) - jnp.einsum(
        "mu,...unc->...mnc", es, ti)
    return out
