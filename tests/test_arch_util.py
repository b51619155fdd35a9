"""arch_util parity: flow_warp / resize_flow / ResidualBlockNoBN."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.nn import arch_util as au
from tests.torch_ref import import_ref_arch, to_nchw, to_nhwc

REF = import_ref_arch("arch_util")


def test_flow_warp_parity(rng):
    x = rng.random((2, 10, 12, 3), dtype=np.float32)
    flow = (rng.random((2, 10, 12, 2), dtype=np.float32) - 0.5) * 4
    ref = REF.flow_warp(to_nchw(x), torch.from_numpy(flow),
                        interp_mode="bilinear", padding_mode="zeros")
    got = au.flow_warp(jnp.asarray(x), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=1e-5)


def test_resize_flow_parity(rng):
    # the reference's own resize_flow crashes under torch>=2
    # (recompute_scale_factor combined with size) — oracle recomputed
    # with the same semantics: scale values by ratio, bilinear resize.
    flow = (rng.random((1, 8, 12, 2), dtype=np.float32) - 0.5) * 4
    ft = torch.from_numpy(flow.transpose(0, 3, 1, 2)).clone()
    ft[:, 0] *= 2.0
    ft[:, 1] *= 2.0
    ref = F.interpolate(ft, size=(16, 24), mode="bilinear",
                        align_corners=False)
    got = au.resize_flow(jnp.asarray(flow), "shape", [16, 24])
    np.testing.assert_allclose(np.asarray(got),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_residual_block(rng):
    key = jax.random.PRNGKey(0)
    p = au.init_residual_block_no_bn(key, 8)
    x = jnp.asarray(rng.random((1, 6, 6, 8), dtype=np.float32))
    y = au.residual_block_no_bn(p, x)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


def test_make_layer(rng):
    key = jax.random.PRNGKey(1)
    params, apply = au.make_layer(au.init_residual_block_no_bn,
                                  au.residual_block_no_bn, key, 3,
                                  num_feat=4)
    x = jnp.asarray(rng.random((1, 4, 4, 4), dtype=np.float32))
    y = apply(params, x)
    assert y.shape == x.shape
