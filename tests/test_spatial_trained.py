"""Full-depth spatially-sharded forward vs unsharded, with TRAINED weights
(VERDICT-r2 #7, resolved per VERDICT-r3 #3).

Round-4 diagnosis (tools/spatial_diag.py, artifact
benchmarks/artifacts/spatial_diag_r4.json): at the 60-iter smoke-trained
weight state the UNSHARDED full-depth FDN amplifies a 1e-7 input
perturbation to ~0.3 max-abs output change — the restore tail's phase
algebra is still chaotic, so NO absolute tolerance on sharded-vs-unsharded
can distinguish a GSPMD bug from reduction-order noise there. The r3
version of this test pinned 3.5e-4 absolute and failed at 2.9e-3 on one
host / 0.25 on another: the number is chaos, not correctness.

What CAN be gated, and is, at every weight state:

  1. perturbation-relative: the H-sharded error must not exceed the
     unsharded program's OWN response to a 1e-7 input perturbation
     (x small margin). GSPMD reduction-order shifts are ulp-scale
     perturbations; a halo/collective BUG is not — it injects a
     structured, perturbation-INDEPENDENT error that breaks this bound
     as training tames the chaos (at cross_check's 300-iter state the
     envelope shrinks ~100x; see spatial_diag_r4_trained.json).
  2. the MAR branch absolutely: its forward is NOT chaotic (1e-7 input
     perturbation moves it ~7e-6), so a conv-halo or collective bug
     in the shared conv/FFT machinery shows up here at full size.

Ref obligation: SURVEY §2.8 spatial row; the tiling analog is
image_restoration_model.py:261-339.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fdn_tip2025_tpu.parallel.mesh import make_mesh

# tools.cross_check calls force_platform() at import, which would move the
# process's persistent compile cache away from the suite's; pin it first.
os.environ.setdefault("FDN_COMPILE_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".xla_cache_tests"))


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_full_depth_spatial_forward_within_chaos_envelope_trained():
    from tools.cross_check import train_fdn, synth_pair
    from fdn_tip2025_tpu.models import fdn_forward

    # smoke-train the full FDN (cross_check recipe, CPU-sized)
    tr, losses = train_fdn(iters=60, size=32, batch=2, lr=1e-3,
                           log_every=0)
    assert losses[-1] < losses[0], losses[::10]
    params = tr.params

    # held-out input: H = 8 shards x 32 rows (x32-aligned per shard)
    lq = synth_pair(np.random.default_rng(5), 256)[0][:, :64]
    x = jnp.asarray(lq[None])
    ratio = jnp.asarray([[0.35]], jnp.float32)

    fwd = jax.jit(lambda p, x, r: fdn_forward(p, x, r))
    ref_out, ref_mar, _, _ = (np.asarray(a) for a in fwd(params, x, ratio))

    # the unsharded program's own sensitivity to an ulp-scale input
    # perturbation — the chaos envelope GSPMD reordering must stay inside
    xp = x + jnp.asarray(
        np.random.default_rng(7).standard_normal(x.shape, np.float32)
        * 1e-7)
    p_out, p_mar, _, _ = (np.asarray(a) for a in fwd(params, xp, ratio))
    ctrl_out = float(np.abs(p_out - ref_out).max())
    ctrl_mar = float(np.abs(p_mar - ref_mar).max())

    mesh = make_mesh(8)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", None, None)))
    ps = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), params)
    out, mar, _, _ = (np.asarray(a) for a in jax.jit(
        lambda p, x, r: fdn_forward(p, x, r))(ps, xs, ratio))

    assert np.isfinite(out).all()
    err_out = float(np.abs(out - ref_out).max())
    err_mar = float(np.abs(mar - ref_mar).max())

    # (1) restore tail: within the chaos envelope (4x margin; measured
    # err 0.25 vs ctrl 0.32 at this state — spatial_diag_r4.json)
    assert err_out < max(4.0 * ctrl_out, 3.5e-4), (
        f"sharded error {err_out} exceeds 4x the unsharded program's own "
        f"1e-7-perturbation response {ctrl_out} — a structured GSPMD "
        "error, not reduction-order noise")
    # (2) MAR branch: non-chaotic, so gate it absolutely AND relative to
    # its own tiny envelope (measured err 1.0e-6 vs ctrl 7.4e-6)
    assert err_mar < max(4.0 * ctrl_mar, 1e-5), (
        f"sharded MAR error {err_mar} vs perturbation control {ctrl_mar} "
        "— conv-halo/collective bug in the shared machinery")
