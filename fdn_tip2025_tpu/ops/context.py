"""Trace-time compute-policy context.

bf16 SPECTRA policy: serving keeps full-image spectra/amp/phase stored in
bf16 (halves the HBM bytes of every spectral segment — VERDICT-r2 #1a);
mixed-precision TRAINING keeps them f32, matching the round-2 numerics and
the reference's torch.autocast behavior (autocast executes FFT ops in f32,
so the reference's AMP analog never sees bf16 spectra either). The flag is
read at TRACE time inside the nn blocks; the trainer scopes it with
:func:`f32_spectra` around its differentiated loss so serving jits built
elsewhere in the same process are unaffected.
"""

from contextlib import contextmanager

_BF16_SPECTRA = True


def bf16_spectra_enabled():
    """True when bf16 inputs may keep their spectra stored in bf16."""
    return _BF16_SPECTRA


@contextmanager
def f32_spectra():
    """Force f32 spectra for traces made inside this block (AMP training)."""
    global _BF16_SPECTRA
    prev = _BF16_SPECTRA
    _BF16_SPECTRA = False
    try:
        yield
    finally:
        _BF16_SPECTRA = prev
