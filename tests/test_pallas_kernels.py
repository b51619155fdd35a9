"""Pallas fused-kernel parity (interpret mode on CPU).

The fused FDSA spectral-chain kernel (kernels/patch_freq.fdsa_chain_cm,
enabled with FDN_PALLAS_CM=1 for bf16 serving) must match the XLA
channel-major chain in nn/attention.py. On-TPU numerics were validated
at 1120x640: max rel 5.3e-3 vs the XLA bf16 chain (the kernel computes
the algebra in f32 registers; the XLA path rounds to bf16 between ops).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.nn.attention import init_fdsa, fdsa
from fdn_tip2025_tpu.nn.ffn import init_fdffn, fdffn


@pytest.fixture
def pallas_cm_env():
    os.environ["FDN_PALLAS_CM"] = "1"
    yield
    os.environ.pop("FDN_PALLAS_CM", None)


def test_fdsa_chain_cm_matches_xla(pallas_cm_env):
    key = jax.random.PRNGKey(0)
    dim = 16
    params = init_fdsa(key, dim)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    params["fft"] = (1.0 + 0.3 * jax.random.normal(
        jax.random.PRNGKey(1), params["fft"].shape)).astype(jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 24, 32, dim)), jnp.bfloat16)

    # eager calls (no jit) so the env flag is re-read per call — jit
    # trace caching would otherwise reuse the first branch taken
    out_kernel = np.asarray(fdsa(params, x), np.float32)
    os.environ.pop("FDN_PALLAS_CM")
    out_xla = np.asarray(fdsa(params, x), np.float32)

    assert out_kernel.shape == out_xla.shape
    denom = np.abs(out_xla).max()
    rel = np.abs(out_kernel - out_xla).max() / denom
    assert rel < 2e-2, f"fused kernel diverges from XLA chain: rel {rel}"


def test_fdffn_rot_cm_matches_xla(pallas_cm_env):
    key = jax.random.PRNGKey(2)
    dim = 16
    params = init_fdffn(key, dim)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    params["ffta"] = (1.0 + 0.3 * jax.random.normal(
        jax.random.PRNGKey(3), params["ffta"].shape)).astype(jnp.bfloat16)
    params["fftp"] = (0.2 * jax.random.normal(
        jax.random.PRNGKey(4), params["fftp"].shape)).astype(jnp.bfloat16)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 24, 32, dim)), jnp.bfloat16)

    out_kernel = np.asarray(fdffn(params, x), np.float32)
    os.environ.pop("FDN_PALLAS_CM")
    out_xla = np.asarray(fdffn(params, x), np.float32)

    assert out_kernel.shape == out_xla.shape
    denom = np.abs(out_xla).max()
    rel = np.abs(out_kernel - out_xla).max() / denom
    assert rel < 2e-2, f"fused FDFFN rot diverges from XLA: rel {rel}"


@pytest.fixture
def pallas_block_env():
    os.environ["FDN_PALLAS_BLOCK"] = "1"
    yield
    os.environ.pop("FDN_PALLAS_BLOCK", None)


def test_fdsa_block_cm_matches_xla(pallas_block_env):
    """Whole-tail kernel (algebra + batched iDFTs + LN + gate + proj):
    full fdsa() equality against the XLA channel-major path."""
    key = jax.random.PRNGKey(5)
    dim = 16
    params = init_fdsa(key, dim)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    params["fft"] = (1.0 + 0.3 * jax.random.normal(
        jax.random.PRNGKey(6), params["fft"].shape)).astype(jnp.bfloat16)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 24, 32, dim)), jnp.bfloat16)

    out_kernel = np.asarray(fdsa(params, x), np.float32)
    os.environ.pop("FDN_PALLAS_BLOCK")
    out_xla = np.asarray(fdsa(params, x), np.float32)

    assert out_kernel.shape == out_xla.shape
    denom = np.abs(out_xla).max()
    rel = np.abs(out_kernel - out_xla).max() / denom
    assert rel < 2e-2, f"block kernel diverges from XLA tail: rel {rel}"


def test_fdsa_block_cm_biasfree(pallas_block_env):
    """BiasFree LayerNorm branch of the block kernel (ADVICE r1: the CM
    tail must not assume bias exists)."""
    key = jax.random.PRNGKey(7)
    dim = 16
    params = init_fdsa(key, dim)
    for n in ("norm1", "norm2", "norm3"):
        params[n]["body"].pop("bias", None)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 16, 24, dim)), jnp.bfloat16)

    out_kernel = np.asarray(fdsa(params, x), np.float32)
    os.environ.pop("FDN_PALLAS_BLOCK")
    out_xla = np.asarray(fdsa(params, x), np.float32)

    denom = np.abs(out_xla).max()
    rel = np.abs(out_kernel - out_xla).max() / denom
    assert rel < 2e-2, f"BiasFree block kernel diverges: rel {rel}"
