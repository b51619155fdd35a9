"""f32 matmul/conv precision policy for TPU.

Measured on v5e (OPTIMIZATIONS.md round-2 "dot algorithm"): for the same
(640, 640) x (640, 1120x32) DFT matmul,

    Precision.HIGHEST                 71.6 ms   rel-err 1.1e-7
    DotAlgorithmPreset.BF16_BF16_F32_X6  7.1 ms   rel-err 1.1e-7  (identical)
    DotAlgorithmPreset.BF16_BF16_F32_X3  7.5 ms   rel-err 8.9e-6
    DEFAULT (single bf16 pass)           7.0 ms   rel-err 1.8e-3

i.e. Precision.HIGHEST lowers to a ~10x slower path than the numerically
identical explicit 6-pass bf16x6 algorithm. All f32 hot-path contractions
therefore use X6 by default; FDN_F32_DOT={x3,x6,highest} overrides, and
sub-f32 (bf16 serving) inputs keep DEFAULT single-pass.

bf16x6 recovers full f32 products: a = a_hi + a_mid + a_lo splits exactly
into 3 bf16 terms (8 mantissa bits each -> 24 bits total), and the 6
cross-products accumulate in f32 — hence the bit-comparable error.
"""

import os

import jax
import jax.numpy as jnp
from jax import lax


def f32_dot_alg():
    """Dot algorithm for f32-exact contractions (None = DEFAULT)."""
    mode = os.environ.get("FDN_F32_DOT", "x6").lower()
    if mode == "default":
        return None
    if jax.default_backend() != "tpu" or mode == "highest":
        # CPU f32 matmuls are exact at any precision; keep HIGHEST for
        # portability (DotAlgorithm support varies off-TPU)
        return lax.Precision.HIGHEST
    return {
        "x3": lax.DotAlgorithmPreset.BF16_BF16_F32_X3,
        "x6": lax.DotAlgorithmPreset.BF16_BF16_F32_X6,
    }[mode]


def dot_precision(dtype):
    """Policy keyed on activation dtype: f32 -> f32-exact algorithm,
    f64 -> HIGHEST (the bf16x6 preset only recovers f32 accuracy),
    sub-f32 (bf16 serving) -> DEFAULT single pass."""
    if dtype == jnp.float64:
        return lax.Precision.HIGHEST
    if dtype == jnp.float32:
        return f32_dot_alg()
    return None
