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


import os as _os

# Full-image transform backend: XLA's TPU FFT is far from bandwidth-bound
# (measured 14.6 ms for a 92 MB roundtrip on v5e), while the MXU runs
# matmuls at ~117 TFLOP/s — an O(N^2) DFT-by-matmul wins for the image
# sizes this model sees. 'matmul' (default) | 'xla' via FDN_FFT_MODE.
_FFT_MODE = _os.environ.get("FDN_FFT_MODE", "matmul")

from jax import lax as _lax

from fdn_tip2025_tpu.ops.precision import dot_precision as _dot_precision


@lru_cache(maxsize=None)
def _dft1d_np(n, rbins=None):
    """(n, rbins) forward-DFT cos/sin matrices, f64 numpy."""
    k = np.arange(n)
    bins = np.arange(rbins if rbins is not None else n)
    ang = -2.0 * np.pi * np.outer(k, bins) / n
    return np.cos(ang), np.sin(ang)


def _dft1d(n, rbins=None):
    c, s = _dft1d_np(n, rbins)
    return jnp.asarray(c, jnp.float32), jnp.asarray(s, jnp.float32)


@lru_cache(maxsize=None)
def _irdft1d_half_np(n):
    """(wf, n) inverse-DFT matrices with the hermitian expansion FOLDED in.

    For a half-spectrum F[..., v<wf] whose tail torch.fft.irfft* would
    reconstruct as X[u, n-v] = conj(X[(H-u)%H, v]), the tail's
    contribution to the REAL final output equals the interior columns'
    contribution duplicated (the H-flip is absorbed by the full H-axis
    inverse sum). So irfft over the last axis is a single (wf, n) matmul
    with interior bins weighted 2 (bin 0 and the even-n Nyquist bin
    weighted 1) — half the FLOPs of expanding to (n, n) and, more
    importantly on TPU, no flip/roll/concat relayouts of the spectrum.
    Kernel returned as (cos, sin) of the CONJUGATE (inverse) exponent."""
    wf = n // 2 + 1
    k = np.arange(wf)
    j = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, j) / n
    w = np.full((wf, 1), 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    return w * np.cos(ang), w * np.sin(ang)


def _irdft1d_half(n):
    c, s = _irdft1d_half_np(n)
    return jnp.asarray(c, jnp.float32), jnp.asarray(s, jnp.float32)


def _rfft2_matmul(x, precision):
    """rfft2 over axes (1, 2) via DFT matmuls.

    FDN_FFT_STAGED=1 opts into the Cooley-Tukey radix-8 staged path
    (~10x fewer FLOPs, verified 3e-7 exact) — measured SLOWER in situ on
    the full forward (f32 0.366 -> 0.351, bf16 0.798 -> 0.719 MP/s): the
    twiddle elementwise passes and 5-D stage layouts cost more than the
    saved MXU time. Kept as a measured dead end; default is the direct
    two-matmul chain."""
    b, h, w, c = x.shape
    if _staged_ok(h) and _staged_ok(w) \
            and _os.environ.get("FDN_FFT_STAGED") == "1":
        xr, xi = _ct_w_rfft(x, precision)
        xr, xi = _ct_axis_cdft(xr, xi, h, 1, precision, inverse=False)
        return xr + 1j * xi
    wf = w // 2 + 1
    cw, sw = _dft1d(w, wf)
    ch, sh = _dft1d(h)
    tr = jnp.einsum("bhwc,wf->bhfc", x, cw, precision=precision)
    ti = jnp.einsum("bhwc,wf->bhfc", x, sw, precision=precision)
    xr = jnp.einsum("hu,bhfc->bufc", ch, tr, precision=precision) - \
        jnp.einsum("hu,bhfc->bufc", sh, ti, precision=precision)
    xi = jnp.einsum("hu,bhfc->bufc", ch, ti, precision=precision) + \
        jnp.einsum("hu,bhfc->bufc", sh, tr, precision=precision)
    return xr + 1j * xi


def _irfft2_matmul(xr, xi, s, precision):
    """torch.fft.irfft2(X, s) semantics: crop the half-spectrum to
    (s0, s1//2+1), hermitian-expand the last freq axis, inverse-DFT via
    matmuls, real part."""
    s0, s1 = s
    wf = s1 // 2 + 1
    xr = xr[:, :s0, :wf]
    xi = xi[:, :s0, :wf]
    if _staged_ok(s0) and _staged_ok(s1) \
            and _os.environ.get("FDN_FFT_STAGED") == "1":
        # staged dead-end path keeps the explicit hermitian expansion:
        # X[u, v] = conj(X[(s0-u) % s0, s1-v]) for v >= wf
        if s1 - wf > 0:
            rev_r = jnp.roll(jnp.flip(xr, axis=1), 1, axis=1)
            rev_i = jnp.roll(jnp.flip(xi, axis=1), 1, axis=1)
            cols = list(range(s1 - wf, 0, -1))
            fr = jnp.concatenate([xr, rev_r[:, :, cols]], axis=2)
            fi = jnp.concatenate([xi, -rev_i[:, :, cols]], axis=2)
        else:
            fr, fi = xr, xi
        # staged: H-axis complex inverse, then W-axis inverse + real part
        # (1/H, 1/W folded into the stage matrices)
        hr, hi = _ct_axis_cdft(fr, fi, s0, 1, precision, inverse=True)
        return _ct_w_inv(hr, hi, s1, precision)
    # hermitian expansion folded into a (wf, s1) inverse matrix
    # (_irdft1d_half): half the W-matmul FLOPs, no flip/roll/concat
    # relayouts of the 92 MB level-1 spectrum.
    cwh, swh = _irdft1d_half(s1)
    ch, sh = _dft1d(s0)
    tr = jnp.einsum("bhvc,vw->bhwc", xr, cwh, precision=precision) - \
        jnp.einsum("bhvc,vw->bhwc", xi, swh, precision=precision)
    ti = jnp.einsum("bhvc,vw->bhwc", xr, swh, precision=precision) + \
        jnp.einsum("bhvc,vw->bhwc", xi, cwh, precision=precision)
    # Re over the full H-axis inverse, E = conj(DFT) = C - iS -> +S sign
    out = jnp.einsum("uh,buwc->bhwc", ch, tr, precision=precision) + \
        jnp.einsum("uh,buwc->bhwc", sh, ti, precision=precision)
    return out / (s0 * s1)


# --- Cooley-Tukey staged full-image DFT (radix-8 x N/8) -------------------
# The direct DFT-by-matmul costs O(N) per output bin; at f32-exact (X6)
# precision the full-image round trip in FCAFFN is matmul-FLOP-bound
# (~110 GFLOP at 1120x640). Factoring each 1-D DFT as
#   X[s*Q + r] = sum_p F_P[p, s] * tw[p, r] * (sum_q F_Q[q, r] x[q*P + p])
# (N = P*Q, P = 8; w = q*P + p) cuts the FLOPs ~10x while producing bins
# in STANDARD order (the (s, r) -> k = s*Q + r merge is a free reshape).
# Twiddles are folded as one elementwise complex multiply between stages.

_RADIX = 8


def _staged_ok(n):
    return n % _RADIX == 0 and n >= 2 * _RADIX


@lru_cache(maxsize=None)
def _ct_mats_np(n, inverse=False):
    """Stage matrices + twiddles for the radix-8 split of an n-point DFT.

    Forward: returns (CQ, SQ) (Q,Q), (twc, tws) (Q, P) indexed [r, p],
    (CP, SP) (P, P) — sign convention e^{-2pi i .. / n}.
    Inverse: conjugate matrices with 1/P, 1/Q normalization folded in.
    """
    P, Q = _RADIX, n // _RADIX
    sgn = 1.0 if inverse else -1.0
    q = np.arange(Q)
    angQ = sgn * 2.0 * np.pi * np.outer(q, q) / Q
    p = np.arange(P)
    angP = sgn * 2.0 * np.pi * np.outer(p, p) / P
    r = np.arange(Q)
    angT = sgn * 2.0 * np.pi * np.outer(r, p) / n   # [r, p]
    nq = Q if inverse else 1.0
    npp = P if inverse else 1.0
    return (
        (np.cos(angQ) / nq).astype(np.float32),
        (np.sin(angQ) / nq).astype(np.float32),
        np.cos(angT).astype(np.float32), np.sin(angT).astype(np.float32),
        (np.cos(angP) / npp).astype(np.float32),
        (np.sin(angP) / npp).astype(np.float32),
    )


def _ct_mats(n, inverse=False):
    return tuple(jnp.asarray(a) for a in _ct_mats_np(n, inverse))


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _ct_w_rfft(x, precision):
    """Staged W-axis real DFT of (B, H, W, C) -> (re, im) (B, H, Wf, C)."""
    b, h, w, c = x.shape
    P, Q = _RADIX, w // _RADIX
    CQ, SQ, twc, tws, CP, SP = _ct_mats(w)
    x5 = x.reshape(b, h, Q, P, c)
    tr = jnp.einsum("bhqpc,qr->bhrpc", x5, CQ, precision=precision)
    ti = jnp.einsum("bhqpc,qr->bhrpc", x5, SQ, precision=precision)
    tb = twc[None, None, :, :, None]
    ts = tws[None, None, :, :, None]
    ur, ui = _cmul(tr, ti, tb, ts)
    s_bins = P // 2 + 1
    xr = jnp.einsum("bhrpc,ps->bhsrc", ur, CP[:, :s_bins],
                    precision=precision) - \
        jnp.einsum("bhrpc,ps->bhsrc", ui, SP[:, :s_bins],
                   precision=precision)
    xi = jnp.einsum("bhrpc,ps->bhsrc", ui, CP[:, :s_bins],
                    precision=precision) + \
        jnp.einsum("bhrpc,ps->bhsrc", ur, SP[:, :s_bins],
                   precision=precision)
    wf = w // 2 + 1
    xr = xr.reshape(b, h, s_bins * Q, c)[:, :, :wf]
    xi = xi.reshape(b, h, s_bins * Q, c)[:, :, :wf]
    return xr, xi


def _ct_axis_cdft(xr, xi, n, axis_pos, precision, inverse):
    """Staged complex DFT along a non-minor axis of a 4-D tensor.

    axis_pos must be 1 (the H axis of (B, H, F, C)). Returns (re, im).
    """
    b, h, f, c = xr.shape
    P, Q = _RADIX, n // _RADIX
    CQ, SQ, twc, tws, CP, SP = _ct_mats(n, inverse)
    xr5 = xr.reshape(b, Q, P, f, c)
    xi5 = xi.reshape(b, Q, P, f, c)
    ar = jnp.einsum("bqpfc,qr->brpfc", xr5, CQ, precision=precision) - \
        jnp.einsum("bqpfc,qr->brpfc", xi5, SQ, precision=precision)
    ai = jnp.einsum("bqpfc,qr->brpfc", xi5, CQ, precision=precision) + \
        jnp.einsum("bqpfc,qr->brpfc", xr5, SQ, precision=precision)
    tb = twc[None, :, :, None, None]
    ts = tws[None, :, :, None, None]
    ur, ui = _cmul(ar, ai, tb, ts)
    outr = jnp.einsum("brpfc,ps->bsrfc", ur, CP, precision=precision) - \
        jnp.einsum("brpfc,ps->bsrfc", ui, SP, precision=precision)
    outi = jnp.einsum("brpfc,ps->bsrfc", ui, CP, precision=precision) + \
        jnp.einsum("brpfc,ps->bsrfc", ur, SP, precision=precision)
    return outr.reshape(b, n, f, c), outi.reshape(b, n, f, c)


def _ct_w_inv(fr, fi, w, precision):
    """Staged W-axis inverse DFT (complex in, real out), 1/W folded in.

    Input (B, H, W, C) full (hermitian-expanded) spectrum; real part of
    the inverse only, matching _irfft2_matmul's final projection.
    """
    b, h, _, c = fr.shape
    P, Q = _RADIX, w // _RADIX
    CQ, SQ, twc, tws, CP, SP = _ct_mats(w, inverse=True)
    # v = s*Q + r: s is the slow digit -> free reshape
    r5r = fr.reshape(b, h, P, Q, c)
    r5i = fi.reshape(b, h, P, Q, c)
    ar = jnp.einsum("bhsrc,sp->bhprc", r5r, CP, precision=precision) - \
        jnp.einsum("bhsrc,sp->bhprc", r5i, SP, precision=precision)
    ai = jnp.einsum("bhsrc,sp->bhprc", r5i, CP, precision=precision) + \
        jnp.einsum("bhsrc,sp->bhprc", r5r, SP, precision=precision)
    tb = jnp.transpose(twc)[None, None, :, :, None]  # [p, r]
    ts = jnp.transpose(tws)[None, None, :, :, None]
    ur, ui = _cmul(ar, ai, tb, ts)
    # real part only: Re(sum_r u[p, r] e^{2pi i q r / Q})
    out = jnp.einsum("bhprc,rq->bhqpc", ur, CQ, precision=precision) - \
        jnp.einsum("bhprc,rq->bhqpc", ui, SQ, precision=precision)
    return out.reshape(b, h, w, c)


def rfft2(x, axes=(1, 2), fast=None):
    """2-D real FFT over the spatial axes of an NHWC tensor.

    Parity: torch.fft.rfft2(x_nchw, norm='backward') on the matching NCHW
    tensor (reference FDN_arch.py:411, 882-914 etc.). Upcasts sub-f32
    inputs (bf16 inference mode) like the reference's .float() casts.

    fast: matmul-DFT precision. Defaults from the input dtype — sub-f32
    (bf16 serving) uses fast single-pass bf16 matmuls; f32 keeps the
    f32-exact dot algorithm (ops.precision).
    """
    if fast is None:
        fast = x.dtype not in (jnp.float32, jnp.float64)
    if x.dtype not in (jnp.float32, jnp.float64):
        x = x.astype(jnp.float32)
    if _FFT_MODE == "matmul" and axes == (1, 2) and x.ndim == 4 \
            and x.dtype == jnp.float32:
        return _rfft2_matmul(
            x, None if fast else _dot_precision(x.dtype))
    return jnp.fft.rfft2(x, axes=axes)


def irfft2(x, s, axes=(1, 2), fast=False):
    """Inverse of :func:`rfft2`; `s` is the full spatial size (H, W)."""
    if _FFT_MODE == "matmul" and axes == (1, 2) and x.ndim == 4 \
            and x.dtype == jnp.complex64:
        return _irfft2_matmul(
            x.real, x.imag, s,
            None if fast else _dot_precision(jnp.float32))
    return jnp.fft.irfft2(x, s=s, axes=axes)


def rfft2_ri(x, axes=(1, 2)):
    """rfft2 over spatial axes returning (re, im) planes in the INPUT
    dtype — no complex64 materialization.

    In bf16 serving the f32 `rfft2` path already rounds its matmul
    OPERANDS to bf16 (fast single-pass dots), so the only f32 thing left
    was the stored spectra/upcasts; this keeps those bf16 too, halving
    the HBM bytes of every full-image spectral segment (VERDICT-r2 #1a:
    the FreBlock/fourier_fuse/prior f32 islands). f32 inputs take the
    exact `rfft2` path unchanged (same HLO) and split the complex result,
    so parity/dryrun programs are untouched.
    """
    if x.dtype in (jnp.float32, jnp.float64) or _FFT_MODE != "matmul" \
            or axes != (1, 2) or x.ndim != 4:
        f = rfft2(x, axes=axes)
        return f.real.astype(x.dtype), f.imag.astype(x.dtype)
    b, h, w, c = x.shape
    wf = w // 2 + 1
    cw, sw = _dft1d(w, wf)
    ch, sh = _dft1d(h)
    cw, sw, ch, sh = (m.astype(x.dtype) for m in (cw, sw, ch, sh))
    tr = jnp.einsum("bhwc,wf->bhfc", x, cw)
    ti = jnp.einsum("bhwc,wf->bhfc", x, sw)
    xr = jnp.einsum("hu,bhfc->bufc", ch, tr) - \
        jnp.einsum("hu,bhfc->bufc", sh, ti)
    xi = jnp.einsum("hu,bhfc->bufc", ch, ti) + \
        jnp.einsum("hu,bhfc->bufc", sh, tr)
    return xr, xi


def irfft2_ri(re, im, s):
    """Inverse of :func:`rfft2_ri` from (re, im) planes; `s` = (H, W)
    full spatial size (torch.fft.irfft2 semantics incl. spectrum crop
    and folded hermitian expansion). Sub-f32 inputs run the whole chain
    in their own dtype (1/(H*W) folded into the W-inverse matrix);
    f32 falls back to the exact `irfft2`."""
    if re.dtype in (jnp.float32, jnp.float64) or _FFT_MODE != "matmul" \
            or re.ndim != 4:
        return irfft2(re + 1j * im, s=s).astype(re.dtype)
    s0, s1 = s
    wf = s1 // 2 + 1
    xr = re[:, :s0, :wf]
    xi = im[:, :s0, :wf]
    cwh, swh = _irdft1d_half(s1)
    ch, sh = _dft1d(s0)
    scale = 1.0 / (s0 * s1)
    cwh, swh = ((m * scale).astype(re.dtype) for m in (cwh, swh))
    ch, sh = ch.astype(re.dtype), sh.astype(re.dtype)
    tr = jnp.einsum("bhvc,vw->bhwc", xr, cwh) - \
        jnp.einsum("bhvc,vw->bhwc", xi, swh)
    ti = jnp.einsum("bhvc,vw->bhwc", xr, swh) + \
        jnp.einsum("bhvc,vw->bhwc", xi, cwh)
    return jnp.einsum("uh,buwc->bhwc", ch, tr) + \
        jnp.einsum("uh,buwc->bhwc", sh, ti)


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
    # numpy has no bfloat16 — build f32 and cast on the jnp side.
    np_name = dtype_name if dtype_name in ("float32", "float64") \
        else "float32"
    return tuple(jnp.asarray(a, jnp.dtype(dtype_name))
                 for a in _dft_mats_np(np_name))


@lru_cache(maxsize=None)
def _dft_combined_np():
    """Single-matmul forms of the 8x8 patch transforms.

    Forward: W (80, 64) mapping the 64 patch pixels to [Re; Im] of the
    40-bin half spectrum. Inverse: A (64, 80) mapping [Re; Im] back to 64
    pixels — with the hermitian expansion folded in, so it reproduces
    torch.fft.irfft2 exactly even for modulated (non-hermitian) spectra.
    Built numerically from the two-stage definition.
    """
    fc, fs, ec, es = _dft_mats_np("float64")
    fck, fsk = fc[:, :_RFREQ], fs[:, :_RFREQ]

    # forward: x (8,8) -> Xr, Xi (8,5)
    def fwd(x):
        tr = x @ fck
        ti = x @ fsk
        xr = fc.T @ tr - fs.T @ ti
        xi = fc.T @ ti + fs.T @ tr
        return xr, xi

    W = np.zeros((80, 64))
    for m in range(PATCH):
        for n in range(PATCH):
            e = np.zeros((PATCH, PATCH))
            e[m, n] = 1.0
            xr, xi = fwd(e)
            W[:40, m * 8 + n] = xr.ravel()
            W[40:, m * 8 + n] = xi.ravel()

    # inverse: (Xr, Xi) (8,5) each -> x (8,8), hermitian-expanded
    def inv(xr, xi):
        rev_r = np.roll(xr[::-1], 1, axis=0)
        rev_i = np.roll(xi[::-1], 1, axis=0)
        fr = np.concatenate([xr, rev_r[:, 3:0:-1]], axis=1)
        fi = np.concatenate([xi, -rev_i[:, 3:0:-1]], axis=1)
        tr = fr @ ec - fi @ es
        ti = fr @ es + fi @ ec
        return ec.T @ tr - es.T @ ti

    A = np.zeros((64, 80))
    for j in range(80):
        b = np.zeros(80)
        b[j] = 1.0
        x = inv(b[:40].reshape(8, 5), b[40:].reshape(8, 5))
        A[:, j] = x.ravel()
    return W.astype(np.float32), A.astype(np.float32)


def _dft_combined(dtype_name="float32"):
    W, A = _dft_combined_np()
    dt = jnp.dtype(dtype_name if dtype_name in ("float32", "float64")
                   else dtype_name)
    return jnp.asarray(W, dt), jnp.asarray(A, dt)


def rfft2_patch8_img(x):
    """Transpose-free patch rfft2 in natural image order.

    x: (B, H, W, C) -> (re, im) each (B, H/8, 8, W/8, 5, C): only free
    reshapes (adjacent-dim splits) + contractions over interior 8-dims —
    no patchify transpose, so XLA emits no layout copies for the patch
    round trip (patchify8's (0,1,3,2,4,5) transpose showed up as ~30% of
    the forward in device profiles).
    """
    b, h, w, c = x.shape
    fc, fs, _, _ = _dft_mats(str(x.dtype))
    fck, fsk = fc[:, :_RFREQ], fs[:, :_RFREQ]
    x6 = x.reshape(b, h // 8, 8, w // 8, 8, c)
    tr = jnp.einsum("bimjnc,nv->bimjvc", x6, fck)
    ti = jnp.einsum("bimjnc,nv->bimjvc", x6, fsk)
    xr = jnp.einsum("bimjvc,mu->biujvc", tr, fc) - jnp.einsum(
        "bimjvc,mu->biujvc", ti, fs)
    xi = jnp.einsum("bimjvc,mu->biujvc", ti, fc) + jnp.einsum(
        "bimjvc,mu->biujvc", tr, fs)
    return xr, xi


def param85(p):
    """(8, 5, C) patch-FFT param -> broadcastable (1,1,8,1,5,C)."""
    return p[None, None, :, None, :, :]


def irfft2_patch8_img(xr, xi):
    """Inverse of rfft2_patch8_img: (B, hb, 8, wb, 5, C) -> (B, H, W, C).

    Hermitian expansion via an interior-dim flip/roll (cheap slices, no
    transpose), two inverse-DFT contractions, free merges back to image.
    """
    b, hb, _, wb, _, c = xr.shape
    _, _, ec, es = _dft_mats(str(xr.dtype))
    # tail columns v = 5..7: conj(X[(8-u) % 8, 8-v])
    rev_r = jnp.roll(jnp.flip(xr, axis=2), 1, axis=2)
    rev_i = jnp.roll(jnp.flip(xi, axis=2), 1, axis=2)
    fr = jnp.concatenate([xr, rev_r[:, :, :, :, 3:0:-1]], axis=4)
    fi = jnp.concatenate([xi, -rev_i[:, :, :, :, 3:0:-1]], axis=4)
    tr = jnp.einsum("biujvc,vn->biujnc", fr, ec) - jnp.einsum(
        "biujvc,vn->biujnc", fi, es)
    ti = jnp.einsum("biujvc,vn->biujnc", fi, ec) + jnp.einsum(
        "biujvc,vn->biujnc", fr, es)
    out = jnp.einsum("biujnc,um->bimjnc", tr, ec) - jnp.einsum(
        "biujnc,um->bimjnc", ti, es)
    return out.reshape(b, hb * 8, wb * 8, c)


def rfft2_patch8_flat(x):
    """Patch rfft2 returning PACKED half-spectrum planes.

    Input (..., 64, C) patches -> (re, im), each (..., 40*C) with row-major
    (freq, channel) packing, fully utilizing the 128-lane axis for the
    spectral elementwise algebra. Measured on v5e (OPTIMIZATIONS.md round-2
    "lane packing"): 3.4x faster than the (..., 8, 5, C) layout when the
    chain is ISOLATED, but slower in situ inside FDSA/FDFFN — the flat
    reshape breaks XLA's patchify-transpose-into-matmul fusion (145x
    pathological in FDSA). Kept for standalone/packed callers; the model
    blocks use rfft2_patch8. Values are IDENTICAL to rfft2_patch8 modulo
    reshape.
    """
    W, _ = _dft_combined(str(x.dtype))
    *b, _, c = x.shape
    f = jnp.einsum("fk,...kc->...fc", W, x,
                   precision=_patch_dft_precision(x.dtype))
    f = f.reshape(*b, 80 * c)
    return f[..., :40 * c], f[..., 40 * c:]


def irfft2_patch8_flat(re, im):
    """Inverse of rfft2_patch8_flat: packed (..., 40*C) re/im planes ->
    (..., 64, C) patches (hermitian expansion folded, like irfft2_patch8).
    """
    _, A = _dft_combined(str(re.dtype))
    *b, fc = re.shape
    c = fc // 40
    mod = jnp.concatenate([re, im], axis=-1).reshape(*b, 80, c)
    return jnp.einsum("kf,...fc->...kc", A, mod,
                      precision=_patch_dft_precision(re.dtype))


# ---------------------------------------------------------------------------
# Channel-major patch pipeline (the TPU-dense layout for FDSA/FDFFN)
# ---------------------------------------------------------------------------
# Device profiles (OPTIMIZATIONS.md round-2) showed the NHWC spectral chain
# bound by layout, not FLOPs: spectra shaped (..., 8, 5, C) tile-pad to
# (8, 128) on the two minor dims (5 -> 8 sublanes, C=38 -> 128 lanes: 5.4x
# physical inflation), channel slices at 38/114 boundaries are lane-copies,
# and XLA ping-pongs layouts between the DFT matmuls and the elementwise
# fusions. In channel-major (C, freq|pixel, Npatches) every tensor is dense
# (40/64 sublanes exact, N in lanes), q/k/v splits are free major-axis
# views, and one layout serves both the matmuls and the elementwise chain —
# at the cost of exactly two explicit transposes per block.


def to_patches_cm(x):
    """NHWC -> channel-major 8x8 patches: (B, H, W, C) -> (C, 64, B*hb*wb).

    Element (c, p1*8+p2, (b*hb+i)*wb + j) = x[b, i*8+p1, j*8+p2, c]. The
    patch grid is merged into ONE minor dim: a 4-D (C, 64, rows, wb)
    variant was measured SLOWER (32 vs 25 ms isolated FDSA) — XLA scatters
    layouts across the 4-D planes, while the 3-D form pins every tensor to
    the dense {2,1,0} layout.
    """
    b, h, w, c = x.shape
    x6 = x.reshape(b, h // 8, 8, w // 8, 8, c)
    xt = x6.transpose(5, 2, 4, 0, 1, 3)  # (c, p1, p2, b, hb, wb)
    return xt.reshape(c, 64, b * (h // 8) * (w // 8))


def from_patches_cm(y, b, h, w):
    """Inverse of :func:`to_patches_cm`: (C, 64, B*hb*wb) -> (B, H, W, C)."""
    c = y.shape[0]
    y6 = y.reshape(c, 8, 8, b, h // 8, w // 8)
    x = y6.transpose(3, 4, 1, 5, 2, 0)  # (b, hb, p1, wb, p2, c)
    return x.reshape(b, h, w, c)


def to_patches_cm_nchw(x):
    """NCHW -> channel-major 8x8 patches: (B, C, H, W) -> (C, 64, B*hb*wb).

    Same element mapping as :func:`to_patches_cm` but from a channel-major
    image (e.g. a conv with out_layout="NCHW") — the permutation no longer
    moves the channel axis, which XLA lowers much more cheaply.
    """
    b, c, h, w = x.shape
    x6 = x.reshape(b, c, h // 8, 8, w // 8, 8)
    xt = x6.transpose(1, 3, 5, 0, 2, 4)  # (c, p1, p2, b, hb, wb)
    return xt.reshape(c, 64, b * (h // 8) * (w // 8))


def from_patches_cm_nchw(y, b, h, w):
    """(C, 64, B*hb*wb) -> (B, C, H, W): inverse of
    :func:`to_patches_cm_nchw`. The channel axis stays in place through
    the permutation (only patch/grid dims move), so XLA lowers it far
    more cheaply than the NHWC inverse — the exit path of the
    channel-major block pipeline (nn/cm_block.py)."""
    c = y.shape[0]
    y6 = y.reshape(c, 8, 8, b, h // 8, w // 8)
    x = y6.transpose(3, 0, 4, 1, 5, 2)  # (b, c, hb, p1, wb, p2)
    return x.reshape(b, c, h, w)


def rfft2_patch8_cm(x):
    """Patch rfft2 on channel-major patches.

    Input (C, 64, *grid); output (re, im), each (C, 40, *grid) with the
    same row-major (8, 5) bin order as :func:`rfft2_patch8`. Identical
    numerics (same (80, 64) combined-DFT matmul; rows are independent
    sums).
    """
    W, _ = _dft_combined(str(x.dtype))
    out = jnp.einsum("fk,ck...->cf...", W, x,
                     precision=_patch_dft_precision(x.dtype))
    return out[:, :40], out[:, 40:]


def irfft2_patch8_cm(re, im):
    """Inverse of :func:`rfft2_patch8_cm`: (C, 40, *grid) -> (C, 64, *grid).

    Hermitian expansion folded into the (64, 80) map, exactly like
    :func:`irfft2_patch8` (torch.fft.irfft2 semantics on modulated
    spectra).
    """
    _, A = _dft_combined(str(re.dtype))
    f = jnp.concatenate([re, im], axis=1)  # (C, 80, *grid), sublane-aligned
    return jnp.einsum("kf,cf...->ck...", A, f,
                      precision=_patch_dft_precision(re.dtype))


def param_cm(p, ndim=3):
    """(8, 5, C) patch-FFT parameter -> channel-major broadcast
    (C, 40, 1, ...) with `ndim - 2` trailing singleton grid dims."""
    c = p.shape[-1]
    return p.reshape(40, c).T.reshape((c, 40) + (1,) * (ndim - 2))


def rfft2_patch8_p40(x):
    """Patch rfft2 on NHWC patches, spectra kept as packed 40-bin planes.

    Input (..., 64, C) flattened patches; output (re, im), each
    (..., 40, C) — row-major (8, 5) bin order, same numerics as
    :func:`rfft2_patch8` WITHOUT the (8, 5, C) reshape: (..., 8, 5, C)
    tile-pads its two minor dims (5->8 sublanes, C->128 lanes) and XLA
    inserts relayout copies around the (..., 80, C) matmul output,
    while the 40-row slice of (..., 80, C) is tile-aligned and free.
    """
    W, _ = _dft_combined(str(x.dtype))
    out = jnp.einsum("fk,...kc->...fc", W, x,
                     precision=_patch_dft_precision(x.dtype))
    return out[..., :40, :], out[..., 40:, :]


def irfft2_patch8_p40(re, im):
    """Inverse of :func:`rfft2_patch8_p40`: (..., 40, C) re/im ->
    (..., 64, C) pixels, hermitian expansion folded (irfft2 semantics on
    modulated spectra). Sublane-aligned concat, one matmul."""
    _, A = _dft_combined(str(re.dtype))
    f = jnp.concatenate([re, im], axis=-2)
    return jnp.einsum("kf,...fc->...kc", A, f,
                      precision=_patch_dft_precision(re.dtype))


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


def _patch_dft_precision(dtype):
    """Matmul precision for the 8x8 patch DFTs.

    f32 inputs default to the f32-exact dot algorithm (ops.precision:
    bf16x6, bit-comparable to Precision.HIGHEST at ~10x its speed): at
    DEFAULT the einsum runs with single-pass bf16 operand rounding, which
    silently degrades the parity mode. bf16 serving keeps DEFAULT.
    FDN_PATCH_DFT_FAST=1 forces DEFAULT in f32 too (speed over parity).
    """
    if dtype not in (jnp.float32, jnp.float64):
        return None
    if _os.environ.get("FDN_PATCH_DFT_FAST") == "1":
        return None
    return _dot_precision(dtype)


def rfft2_patch8(x):
    """rfft2 of each 8x8 patch via DFT matmuls.

    Input:  (..., 8, 8, C) real.
    Output: (real, imag), each (..., 8, 5, C).

    Parity: torch.fft.rfft2(patches, norm='backward') over the trailing
    8x8 patch dims (FDN_arch.py:460, 585-589).

    One (80, 64) matmul over the flattened patch dim (channels stay in
    lanes) instead of chained 8-point contractions.
    """
    W, _ = _dft_combined(str(x.dtype))
    b = x.shape[:-3]
    c = x.shape[-1]
    flat = x.reshape(*b, 64, c)
    out = jnp.einsum("fk,...kc->...fc", W, flat,
                     precision=_patch_dft_precision(x.dtype))
    xr = out[..., :40, :].reshape(*b, 8, 5, c)
    xi = out[..., 40:, :].reshape(*b, 8, 5, c)
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
    Parity: torch.fft.irfft2(X, s=(8, 8), norm='backward') — including its
    behavior on modulated (non-hermitian) half spectra, via the folded
    hermitian expansion in the (64, 80) inverse map.
    """
    _, A = _dft_combined(str(xr.dtype))
    b = xr.shape[:-3]
    c = xr.shape[-1]
    flat = jnp.concatenate([xr.reshape(*b, 40, c),
                            xi.reshape(*b, 40, c)], axis=-2)
    out = jnp.einsum("kf,...fc->...kc", A, flat,
                     precision=_patch_dft_precision(xr.dtype))
    return out.reshape(*b, 8, 8, c)
