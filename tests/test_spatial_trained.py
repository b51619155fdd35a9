"""Full-depth spatially-sharded forward vs unsharded, with TRAINED weights
(VERDICT-r2 #7).

The shallow (1,1,1)-block gate in tests/test_multichip_serving.py runs at
PSNR-level tolerance because random weights are chaotic (the MAR gamma
pow amplifies last-ulp GSPMD reduction-order shifts ~40x). Smoke-trained
weights tame the Lipschitz blowup, so this gate runs the FULL-depth FDN
(enc 6/6/10, dec 10/6/6, refine 4 — the exact program `FDNPredictor(mesh,
spatial=True)` serves) H-sharded over the 8-virtual-device mesh and
pins a much tighter tolerance.

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
def test_full_depth_spatial_forward_matches_unsharded_trained():
    from tools.cross_check import train_fdn, synth_pair
    from fdn_tip2025_tpu.models import fdn_forward

    # smoke-train the full FDN (cross_check recipe, CPU-sized): enough
    # iters to leave the chaotic random-init regime
    tr, losses = train_fdn(iters=60, size=32, batch=2, lr=1e-3,
                           log_every=0)
    assert losses[-1] < losses[0], losses[::10]
    params = tr.params

    # held-out input: H = 8 shards x 32 rows (x32-aligned per shard)
    lq = synth_pair(np.random.default_rng(5), 256)[0][:, :64]
    x = jnp.asarray(lq[None])
    ratio = jnp.asarray([[0.35]], jnp.float32)

    ref = np.asarray(jax.jit(
        lambda p, x, r: fdn_forward(p, x, r)[0])(params, x, ratio))

    mesh = make_mesh(8)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", None, None)))
    ps = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), params)
    out = np.asarray(jax.jit(
        lambda p, x, r: fdn_forward(p, x, r)[0])(ps, xs, ratio))

    assert np.isfinite(out).all()
    maxabs = float(np.abs(out - ref).max())
    # trained weights: require an order tighter than the shallow random-
    # weight gate's 3.5e-3 (fails loudly if GSPMD halo/collective
    # decomposition ever drifts beyond ulp-reordering noise)
    assert maxabs < 3.5e-4, f"spatial-vs-unsharded max abs {maxabs}"
