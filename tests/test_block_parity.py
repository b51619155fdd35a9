"""Block-level numerical parity against the PyTorch reference modules.

Each test instantiates the reference block (imported from /root/reference,
never copied), converts its state dict through checkpoint.torch_import, runs
our NHWC implementation on the same input, and compares.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu import nn as fnn
from fdn_tip2025_tpu.checkpoint import convert_state_dict
from tests.conftest import assert_close
from tests.torch_ref import import_ref_arch, to_nchw, to_nhwc, seed_all

ARCH = pytest.importorskip("tests.torch_ref").import_ref_arch("FDN_arch")
KEY = jax.random.PRNGKey(0)


def sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()
            if not k.endswith("num_batches_tracked")}


def rand(rng, shape, lo=-1.0, hi=1.0):
    return rng.random(shape, dtype=np.float32) * (hi - lo) + lo


def test_fre_block(rng):
    seed_all()
    m = ARCH.FreBlock(6).eval()
    x = rand(rng, (2, 12, 16, 6))
    ref = m(to_nchw(x))
    p = convert_state_dict(sd(m), fnn.init_fre_block(KEY, 6))
    got = fnn.fre_block(p, jnp.asarray(x))
    # atol: torch.angle at the +-pi branch cut can flip by 2*pi on fp noise
    # (reference feeds raw angles into convs); bitwise parity is impossible.
    assert_close(np.asarray(got), to_nhwc(ref), atol=5e-3)


def test_process_block_fdn(rng):
    seed_all()
    m = ARCH.ProcessBlock(8).eval()
    x = rand(rng, (1, 8, 8, 8))
    ref = m(to_nchw(x))
    p = convert_state_dict(sd(m), fnn.init_process_block(KEY, 8))
    got = fnn.process_block(p, jnp.asarray(x), variant="fdn")
    assert_close(np.asarray(got), to_nhwc(ref), atol=5e-3)


def test_fourier_fuse(rng):
    seed_all()
    m = ARCH.fourier_fuse(12, 4).eval()
    x1 = rand(rng, (1, 10, 12, 4))
    x2 = rand(rng, (1, 10, 12, 4))
    x4 = rand(rng, (1, 10, 12, 4))
    ref = m(to_nchw(x1), to_nchw(x2), to_nchw(x4))
    p = convert_state_dict(sd(m), fnn.init_fourier_fuse(KEY, 12, 4))
    got = fnn.fourier_fuse(p, jnp.asarray(x1), jnp.asarray(x2),
                           jnp.asarray(x4))
    assert_close(np.asarray(got), to_nhwc(ref), atol=5e-3)


def test_fam_aff(rng):
    seed_all()
    m = ARCH.FAM(4).eval()
    x1 = rand(rng, (1, 6, 6, 4))
    x2 = rand(rng, (1, 6, 6, 4))
    ref = m(to_nchw(x1), to_nchw(x2))
    p = convert_state_dict(sd(m), fnn.init_fam(KEY, 4))
    got = fnn.fam(p, jnp.asarray(x1), jnp.asarray(x2))
    assert_close(np.asarray(got), to_nhwc(ref), atol=1e-5)

    a = ARCH.AFF(12, 4).eval()
    ref = a(to_nchw(x1), to_nchw(x2), to_nchw(x1))
    pa = convert_state_dict(sd(a), fnn.init_aff(KEY, 12, 4))
    got = fnn.aff(pa, jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(x1))
    assert_close(np.asarray(got), to_nhwc(ref), atol=1e-5)


def test_basic_conv_transpose(rng):
    seed_all()
    m = ARCH.BasicConv(8, 4, kernel_size=4, relu=True, stride=2,
                       transpose=True).eval()
    x = rand(rng, (1, 6, 6, 8))
    ref = m(to_nchw(x))
    p, _ = fnn.init_basic_conv(KEY, 8, 4, 4, stride=2, transpose=True)
    # state dict names main.0.*; mark as transposed-conv via a fake path
    flat_sd = {f"f2_up.{k}": v for k, v in sd(m).items()}
    from fdn_tip2025_tpu.utils.pytree import flatten, unflatten
    target = unflatten({f"f2_up.{k}": v
                        for k, v in flatten(p).items()})
    conv = convert_state_dict(flat_sd, target)["f2_up"]
    got = fnn.basic_conv(conv, jnp.asarray(x), 4, stride=2, transpose=True)
    assert_close(np.asarray(got), to_nhwc(ref), atol=1e-5)


def test_fdsa(rng):
    seed_all()
    m = ARCH.FDSA(16, bias=False).eval()
    x = rand(rng, (1, 16, 16, 16))
    ref = m(to_nchw(x))
    p = convert_state_dict(sd(m), fnn.init_fdsa(KEY, 16))
    got = fnn.fdsa(p, jnp.asarray(x))
    assert_close(np.asarray(got), to_nhwc(ref), atol=5e-4)


def test_fdffn(rng):
    seed_all()
    m = ARCH.FDFFN(16, bias=False).eval()
    x = rand(rng, (1, 16, 16, 16))
    ref = m(to_nchw(x))
    p = convert_state_dict(sd(m), fnn.init_fdffn(KEY, 16))
    got = fnn.fdffn(p, jnp.asarray(x))
    assert_close(np.asarray(got), to_nhwc(ref), atol=5e-4)


def test_fcaffn(rng):
    seed_all()
    m = ARCH.FCAFFN(16, bias=False, use_light=True, use_img=True).eval()
    x = rand(rng, (1, 16, 16, 16))
    x_high = rand(rng, (1, 16, 9, 3), 0, 2)   # amplitude prior (freq domain)
    xp2 = rand(rng, (1, 16, 9, 3), -3, 3)     # phase prior
    x_img = rand(rng, (1, 16, 16, 3), 0, 1)
    ref = m(to_nchw(x), to_nchw(x_high), to_nchw(xp2), to_nchw(x_img))
    p = convert_state_dict(sd(m), fnn.init_fcaffn(KEY, 16))
    got = fnn.fcaffn(p, jnp.asarray(x), jnp.asarray(x_high),
                     jnp.asarray(xp2), jnp.asarray(x_img))
    assert_close(np.asarray(got), to_nhwc(ref), atol=5e-4)


def test_transformer_block(rng):
    seed_all()
    m = ARCH.TransformerBlock(dim=16, att=True, use_light=True,
                              use_img=True).eval()
    x = rand(rng, (1, 16, 16, 16))
    x_high = rand(rng, (1, 16, 9, 3), 0, 2)
    xp2 = rand(rng, (1, 16, 9, 3), -3, 3)
    x_img = rand(rng, (1, 16, 16, 3), 0, 1)
    ref = m((to_nchw(x), to_nchw(x_high), to_nchw(xp2), to_nchw(x_img)))[0]
    p = convert_state_dict(
        sd(m), fnn.init_transformer_block(KEY, 16, att=True, use_light=True))
    got = fnn.transformer_block(
        p, (jnp.asarray(x), jnp.asarray(x_high), jnp.asarray(xp2),
            jnp.asarray(x_img)), att=True, use_light=True)[0]
    assert_close(np.asarray(got), to_nhwc(ref), atol=1e-3)


def test_fuse(rng):
    seed_all()
    m = ARCH.Fuse(8).eval()
    enc = rand(rng, (1, 16, 16, 8))
    dnc = rand(rng, (1, 16, 16, 8))
    ref = m(to_nchw(enc), to_nchw(dnc), None, None, None)
    p = convert_state_dict(sd(m), fnn.init_fuse(KEY, 8))
    got = fnn.fuse(p, jnp.asarray(enc), jnp.asarray(dnc), None, None, None)
    assert_close(np.asarray(got), to_nhwc(ref), atol=5e-4)


def test_down_up_sample(rng):
    seed_all()
    m = ARCH.Downsample(8).eval()
    x = rand(rng, (1, 16, 16, 8))
    ref = m(to_nchw(x))
    p = convert_state_dict(sd(m), fnn.init_downsample(KEY, 8))
    got = fnn.downsample(p, jnp.asarray(x))
    assert_close(np.asarray(got), to_nhwc(ref), atol=1e-5)

    u = ARCH.Upsample(8).eval()
    ref = u(to_nchw(x))
    pu = convert_state_dict(sd(u), fnn.init_upsample(KEY, 8))
    got = fnn.upsample(pu, jnp.asarray(x))
    assert_close(np.asarray(got), to_nhwc(ref), atol=1e-5)


def test_se_block(rng):
    seed_all()
    lp = import_ref_arch("LPNet_arch")
    m = lp.SEBlock(16, (16, 16, 32), stride=2, is_1x1conv=True).eval()
    x = rand(rng, (1, 12, 12, 16))
    with torch.no_grad():
        ref = m(to_nchw(x))
    p = convert_state_dict(
        sd(m), fnn.init_se_block(KEY, 16, (16, 16, 32), stride=2,
                                 is_1x1conv=True))
    got = fnn.se_block(p, jnp.asarray(x), stride=2, is_1x1conv=True)
    assert_close(np.asarray(got), to_nhwc(ref), atol=1e-4)
