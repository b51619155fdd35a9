"""kernels/dwconv.py vs the XLA conv path (interpret mode on CPU).

The kernel must reproduce ops.conv2d's depthwise semantics exactly
(same taps, same torch grouped-channel order) including the fused
gelu / gate tails it replaces in FDFFN/FCAFFN/FDSA.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.kernels.dwconv import (
    dwconv3x3, dwconv3x3_gate, gate_perm,
)
from fdn_tip2025_tpu.ops import conv2d, gelu


@pytest.mark.parametrize("h,w,c", [(16, 24, 8), (24, 16, 38), (8, 40, 5)])
def test_dwconv3x3_matches_conv2d(rng, h, w, c):
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, c)) * 0.2, jnp.float32)
    ref = conv2d(x, k, None, padding=1, groups=c)
    out = dwconv3x3(x, k, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_dwconv3x3_fused_gelu(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 6)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, 6)) * 0.2, jnp.float32)
    ref = gelu(conv2d(x, k, None, padding=1, groups=6))
    out = dwconv3x3(x, k, act="gelu", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_dwconv3x3_gate_matches_m2_chunk(rng):
    """dwconv3x3_gate == the reference's dwconv(h -> 2h, groups=h) +
    chunk(2) + gelu(g1)*g2 (FDN_arch.py:455,470-472) modulo the
    documented gate_perm channel order, and folding gate_perm into a
    downstream 1x1 weight reproduces the torch-order projection."""
    c = 10
    x = jnp.asarray(rng.standard_normal((1, 16, 24, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, 2 * c)) * 0.2,
                    jnp.float32)
    g = conv2d(x, k, None, padding=1, groups=c)
    g1, g2 = jnp.split(g, 2, axis=-1)
    ref = gelu(g1) * g2
    out = dwconv3x3_gate(x, k, interpret=True)
    perm = gate_perm(c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref)[..., perm],
                               atol=1e-5, rtol=1e-5)
    # projection-folding contract
    w1 = jnp.asarray(rng.standard_normal((c, 7)), jnp.float32)
    want = jnp.einsum("bhwc,co->bhwo", ref, w1)
    got = jnp.einsum("bhwc,co->bhwo", out, w1[perm])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_dwconv3x3_ragged_height(rng):
    """H not a multiple of the row tile: zero-pad rows must not leak."""
    x = jnp.asarray(rng.standard_normal((1, 13, 16, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, 4)) * 0.2, jnp.float32)
    ref = conv2d(x, k, None, padding=1, groups=4)
    out = dwconv3x3(x, k, tile_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
