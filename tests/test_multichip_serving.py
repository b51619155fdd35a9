"""Multi-chip batched tiled serving (VERDICT r1 #10).

On the virtual 8-device CPU mesh (tests/conftest.py): tile batches must be
genuinely sharded one-tile-per-device over the "data" axis, and the
mesh-sharded stitched result must equal the single-device one. (Wall-clock
scaling cannot be shown on a 1-core host — per-device sharding of every
forward is the proxy the driver's real-TPU bench builds on.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import assert_close
from fdn_tip2025_tpu.parallel.mesh import make_mesh
from fdn_tip2025_tpu.parallel.spatial import tiled_restore, tile_plan


def test_tile_plan_covers_image():
    idxes = tile_plan(96, 128, 32, 32)
    cov = np.zeros((96, 128))
    for i, j in idxes:
        cov[i:i + 32, j:j + 32] += 1
    assert (cov >= 1).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tiled_restore_mesh_sharded_matches_single_device(rng):
    mesh = make_mesh(8)
    img = rng.random((96, 96, 3), dtype=np.float32)

    # toy "restorer": nonlinear but deterministic, shape-preserving
    @jax.jit
    def fwd(tiles):
        return jnp.tanh(tiles * 2.0) + 0.1 * tiles ** 2

    seen = []

    def fwd_spy(tiles):
        seen.append(tiles.sharding)
        return fwd(tiles)

    out_mesh = tiled_restore(fwd_spy, img, 32, 32, batch_size=8, mesh=mesh)
    out_single = tiled_restore(fwd, img, 32, 32, batch_size=8, mesh=None)

    assert seen, "forward never called"
    for sh in seen:
        assert len(sh.device_set) == 8, sh  # one tile per device
    assert_close(out_mesh, out_single, atol=1e-6, rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_predictor_mesh_dp_matches_single_device(rng):
    """FDNPredictor(mesh=...): batch-sharded DP serving equals the
    single-device path, including the zero-pad to a mesh multiple
    (batch 5 on 8 devices) and the explicit-ratio protocol.

    Uses a toy restorer in place of the full FDN forward (the full-model
    mesh compile lives in __graft_entry__.dryrun_multichip; suite budget
    keeps this test light) — the plumbing under test is the predictor's
    sharding/padding, not the network."""
    from fdn_tip2025_tpu.inference import FDNPredictor
    from fdn_tip2025_tpu.parallel.mesh import replicate_tree

    mesh = make_mesh(8)
    toy_params = {"g": jnp.asarray(1.5, jnp.float32)}

    def toy_fwd(p, x, ratio):
        return (jnp.tanh(x * p["g"]) + ratio[:, :, None, None],)

    def build(mesh_arg):
        pred = FDNPredictor.__new__(FDNPredictor)  # skip full-FDN init
        pred.variant = "lolblur"
        pred.dtype = jnp.float32
        pred.mesh = mesh_arg
        pred._fdn_fwd = toy_fwd
        pred.fdn_params = (replicate_tree(toy_params, mesh_arg)
                           if mesh_arg is not None else toy_params)
        pred.lpnet_params = {}
        pred._jit_cache = {}
        return pred

    imgs = rng.random((5, 40, 56, 3), dtype=np.float32)
    ratios = rng.random((5,), dtype=np.float32)
    out_mesh = build(mesh).restore(imgs, ratio=ratios)
    out_single = build(None).restore(imgs, ratio=ratios)
    assert out_mesh.shape == (5, 40, 56, 3)
    assert_close(out_mesh, out_single, atol=1e-6, rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_predictor_spatial_sharded_matches_single_device(rng):
    """FDNPredictor(mesh=..., spatial=True): one image's rows sharded
    across the mesh (the sequence-parallel analog, SURVEY §2.8) must
    equal the single-device forward, with GSPMD supplying the conv halo
    exchanges and the full-image-DFT collectives.

    Uses the shallow (1,1,1)-block FDN (tools/bench_multichip.py
    pattern): the full 44-block random-weight model is numerically
    chaotic, and this depth compiles inside the suite budget while still
    exercising real convs, patch DFTs, and full-image DFTs under the
    sharding."""
    from fdn_tip2025_tpu.inference import FDNPredictor
    from fdn_tip2025_tpu.models import fdn_forward
    from fdn_tip2025_tpu.models.mar import init_mar
    from fdn_tip2025_tpu.models.fdformer import init_fdformer
    from fdn_tip2025_tpu.ops import init_layer_norm
    from fdn_tip2025_tpu.parallel.mesh import replicate_tree

    mesh = make_mesh(8)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "net_a": init_mar(k1, variant="fdn"),
        "net_p": init_fdformer(k2, inp_channels=3, out_channels=3,
                               dim=32, num_blocks=(1, 1, 1),
                               num_refinement_blocks=1, bias=False),
        "norm1": {"body": init_layer_norm(3)},
        "norm2": {"body": init_layer_norm(3)},
        "norm3": {"body": init_layer_norm(3)},
    }

    def build(mesh_arg, spatial):
        pred = FDNPredictor.__new__(FDNPredictor)  # skip full-FDN init
        pred.variant = "lolblur"
        pred.dtype = jnp.float32
        pred.mesh = mesh_arg
        pred.spatial = spatial
        pred._fdn_fwd = fdn_forward
        pred.fdn_params = (replicate_tree(params, mesh_arg)
                           if mesh_arg is not None else params)
        pred.lpnet_params = {}
        pred._jit_cache = {}
        return pred

    img = rng.random((40, 56, 3), dtype=np.float32)
    sp = build(mesh, True)
    out_sp = sp.restore(img, ratio=0.4)
    out_single = build(None, False).restore(img, ratio=0.4)
    assert out_sp.shape == (40, 56, 3)
    # GSPMD's halo/partial-sum decomposition shifts last-ulp reduction
    # orders and the MAR gamma pow 1-(1-x)^(40m) amplifies them (measured
    # here: ~3.5e-3 max-abs even at depth 1) — assert at the PSNR level
    # the way the trained-weights cross-implementation gate does
    # (tools/cross_check.py; random-weight chaos journal, OPTIMIZATIONS.md)
    diff = out_sp - out_single
    psnr = -10.0 * np.log10(np.mean(diff * diff) + 1e-20)
    assert psnr > 50.0, (psnr, np.abs(diff).max())
    assert np.abs(diff).max() < 2e-2

    # prove the program really ran row-sharded: the cached executable's
    # output carries the spatial spec on H
    (fn,) = sp._jit_cache.values()
    ph, pw = sp._pad_hw(40, 56)
    x = jnp.asarray(np.pad(img[None], ((0, 0), (0, ph), (0, pw), (0, 0)),
                           mode="reflect"))
    dev_out = fn(sp.fdn_params, x, jnp.asarray([[0.4]], jnp.float32))
    spec = dev_out.sharding.spec
    assert tuple(spec) == (None, "data", None, None), spec
    assert len(dev_out.sharding.device_set) == 8
