"""Channel-major (NCHW) block pipeline parity (nn/cm_block.py).

The CM variant must compute the SAME function as the NHWC blocks — the
only differences are layout permutations and dot/reduce associativity,
so f32 agreement is at the 1e-5 band of the existing block-parity suite
(tests/test_block_parity.py), NOT a chaos-level bound: no gamma pow or
deep stack sits between the two paths being compared.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fdn_tip2025_tpu.nn import (  # noqa: E402
    transformer_block, init_transformer_block,
)
from fdn_tip2025_tpu.nn.cm_block import (  # noqa: E402
    transformer_block_nchw, to_nchw, from_nchw,
)


def _mk_state(rng, b, h, w, dim, dtype=np.float32):
    # x_high (amplitude) / x_p (phase) priors live in the half-spectrum:
    # width w//2+1 (reference FDN_arch.py:882-914); x_img is spatial.
    wf = w // 2 + 1
    x = rng.standard_normal((b, h, w, dim)).astype(dtype)
    x_high = (rng.random((b, h, wf, 3)) * 2).astype(dtype)
    x_p = rng.standard_normal((b, h, wf, 3)).astype(dtype)
    x_img = rng.random((b, h, w, 3)).astype(dtype)
    return (jnp.asarray(x), jnp.asarray(x_high), jnp.asarray(x_p),
            jnp.asarray(x_img))


@pytest.mark.parametrize("att,use_light", [(True, True), (True, False)])
def test_block_nchw_matches_nhwc_f32(rng, att, use_light):
    dim = 32
    params = init_transformer_block(jax.random.PRNGKey(3), dim,
                                    att=att, use_light=use_light)
    # non-trivial fft/ffta/fftp params so the spectral paths are exercised
    kp = jax.random.PRNGKey(7)
    ka, kb, kc = jax.random.split(kp, 3)
    if att:
        params["attn"]["fft"] = jax.random.normal(
            ka, params["attn"]["fft"].shape) * 0.5 + 1.0
    params["ffn"]["ffta"] = jax.random.normal(
        kb, params["ffn"]["ffta"].shape) * 0.3 + 1.0
    params["ffn"]["fftp"] = jax.random.normal(
        kc, params["ffn"]["fftp"].shape) * 0.3

    state = _mk_state(rng, 2, 16, 24, dim)
    ref = transformer_block(params, state, att=att, use_light=use_light)[0]
    got_c = transformer_block_nchw(
        params, (to_nchw(state[0]),) + state[1:], att=att,
        use_light=use_light)[0]
    got = from_nchw(got_c)
    diff = float(jnp.max(jnp.abs(got - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert diff < 2e-5 * max(scale, 1.0), (diff, scale)


def test_level1_chain_cm_matches_default(rng):
    """Full FDN forward with FDN_CM_LEVEL1=1 vs default at f32, shallow
    depth (1 block per level) so the comparison stays out of the chaotic
    regime while still exercising the CM entry/exit wiring, the scanned
    carry, and both level-1 chains."""
    from fdn_tip2025_tpu.models.fdformer import (
        init_fdformer, fdformer_forward,
    )
    dim = 16
    params = init_fdformer(jax.random.PRNGKey(0), dim=dim,
                           num_blocks=(2, 1, 1), num_refinement_blocks=2)
    b, h, w = 1, 32, 64  # x32-aligned: every level's H/W must be x8
    inp = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
    # amplitude/phase priors in the half-spectrum (w//2+1); MAR images
    # spatial — matching models/fdn.py's prior construction
    pri = {
        "x_high1": jnp.asarray(rng.random((b, h, w // 2 + 1, 3),
                                          np.float32)),
        "x_high2": jnp.asarray(rng.random((b, h // 2, w // 4 + 1, 3),
                                          np.float32)),
        "x_high3": jnp.asarray(rng.random((b, h // 4, w // 8 + 1, 3),
                                          np.float32)),
        "x1": jnp.asarray(rng.random((b, h, w, 3), np.float32)),
        "x2": jnp.asarray(rng.random((b, h // 2, w // 2, 3), np.float32)),
        "x3": jnp.asarray(rng.random((b, h // 4, w // 4, 3), np.float32)),
    }
    pri.update({
        "x_high12": pri["x_high1"] * 0.5, "x_high22": pri["x_high2"] * 0.5,
        "x_high32": pri["x_high3"] * 0.5,
    })
    old = os.environ.pop("FDN_CM_LEVEL1", None)
    try:
        ref = np.asarray(fdformer_forward(params, inp, **pri))
        os.environ["FDN_CM_LEVEL1"] = "1"
        got = np.asarray(fdformer_forward(params, inp, **pri))
    finally:
        os.environ.pop("FDN_CM_LEVEL1", None)
        if old is not None:
            os.environ["FDN_CM_LEVEL1"] = old
    diff = np.max(np.abs(got - ref))
    scale = max(np.max(np.abs(ref)), 1.0)
    assert diff < 5e-5 * scale, (diff, scale)


def test_block_nchw_bf16_close_to_f32_reference(rng):
    """bf16 CM block vs f32 NHWC block: agreement within the bf16
    rounding envelope (the serving mode the pipeline targets)."""
    dim = 32
    params = init_transformer_block(jax.random.PRNGKey(5), dim,
                                    att=True, use_light=False)
    state = _mk_state(rng, 1, 16, 16, dim)
    ref = transformer_block(params, state, att=True, use_light=False)[0]
    bf = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                      if a.dtype == jnp.float32 else a, params)
    st_bf = tuple(s.astype(jnp.bfloat16) for s in state)
    got_c = transformer_block_nchw(
        bf, (to_nchw(st_bf[0]),) + st_bf[1:], att=True, use_light=False)[0]
    got = from_nchw(got_c).astype(jnp.float32)
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.15, rel  # bf16 rounding through a whole block
