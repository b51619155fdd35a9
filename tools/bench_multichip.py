#!/usr/bin/env python
"""Multi-chip batched tiled-serving benchmark (VERDICT r1 #10).

Runs the mesh-sharded tiled FDN forward (parallel/spatial.py — the
reference's grids/grids_inverse protocol, image_restoration_model.py:
261-339, batched and data-parallel over the mesh) and emits ONE JSON
line:

  {"devices": N, "tiles": T, "tile": "SxS", "sharded_ok": true,
   "match_single_device": true, "tiles_per_sec": X,
   "wallclock_valid": <bool>}

On a host with fewer than --devices visible chips it re-execs itself on
a virtual N-device CPU mesh (the __graft_entry__ / tests/conftest.py
recipe). There, `sharded_ok` (every forward's tile batch really is
sharded one-tile-per-device) and `match_single_device` (the stitched
mesh result equals the unsharded one) are the meaningful artifacts;
`wallclock_valid` is false because N virtual devices share one physical
core, so tiles_per_sec says nothing about scaling. On real multi-chip
hardware wallclock_valid is true and tiles_per_sec is the headline.

  python tools/bench_multichip.py --devices 8 --crop 96 --image 384
"""

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--crop", type=int, default=96)
    ap.add_argument("--image", type=int, default=384,
                    help="square test-image side")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    if len(jax.devices()) < args.devices:
        env = dict(os.environ)
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count"
                f"={args.devices}").strip()
        env["JAX_PLATFORMS"] = "cpu"
        env["FDN_MULTICHIP_VIRTUAL"] = "1"
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            f"import sys; sys.path.insert(0, {_REPO!r}); "
            f"sys.argv = ['bench_multichip', '--devices', "
            f"'{args.devices}', '--crop', '{args.crop}', '--image', "
            f"'{args.image}', '--repeats', '{args.repeats}']; "
            "import importlib.util as u; "
            f"spec = u.spec_from_file_location('bm', "
            f"{os.path.abspath(__file__)!r}); m = u.module_from_spec(spec); "
            "spec.loader.exec_module(m); m.main()"
        )
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              cwd=_REPO, capture_output=True, text=True)
        sys.stdout.write(proc.stdout)
        sys.stderr.write(proc.stderr)
        sys.exit(proc.returncode)

    import numpy as np
    import jax.numpy as jnp
    from fdn_tip2025_tpu.models import init_fdn, fdn_forward
    from fdn_tip2025_tpu.models.mar import init_mar
    from fdn_tip2025_tpu.models.fdformer import init_fdformer
    from fdn_tip2025_tpu.ops import init_layer_norm
    from fdn_tip2025_tpu.parallel.mesh import make_mesh
    from fdn_tip2025_tpu.parallel.spatial import tiled_restore, tile_plan

    n_dev = args.devices
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(0)
    img = rng.random((args.image, args.image, 3), dtype=np.float32)
    virtual = os.environ.get("FDN_MULTICHIP_VIRTUAL") == "1"
    if virtual:
        # shallow FDN on the CPU mesh: the full 44-block random-weight
        # model is numerically chaotic (OPTIMIZATIONS.md), so the
        # mesh-vs-single equality check must use a depth where sharded
        # recompilation's last-ulp differences cannot amplify; it also
        # compiles ~10x faster on the 1-core host
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        params = {
            "net_a": init_mar(k1, variant="fdn"),
            "net_p": init_fdformer(k2, inp_channels=3, out_channels=3,
                                   dim=32, num_blocks=(1, 1, 1),
                                   num_refinement_blocks=1, bias=False),
            "norm1": {"body": init_layer_norm(3)},
            "norm2": {"body": init_layer_norm(3)},
            "norm3": {"body": init_layer_norm(3)},
        }
    else:
        params = init_fdn(jax.random.PRNGKey(0))
    ratio = jnp.full((n_dev, 1), 0.4, jnp.float32)

    @jax.jit
    def fwd(tiles):
        return fdn_forward(params, tiles, ratio[: tiles.shape[0]])[0]

    shardings = []

    def fwd_spy(tiles):
        shardings.append(tiles.sharding)
        return fwd(tiles)

    n_tiles = len(tile_plan(args.image, args.image, args.crop, args.crop))
    # warm + correctness: mesh-sharded vs single-device stitched result
    out_mesh = tiled_restore(fwd_spy, img, args.crop, args.crop,
                             batch_size=n_dev, mesh=mesh)
    out_single = tiled_restore(fwd, img, args.crop, args.crop,
                               batch_size=n_dev, mesh=None)
    sharded_ok = bool(shardings) and all(
        len(s.device_set) == n_dev for s in shardings)
    match = bool(np.allclose(out_mesh, out_single, atol=1e-5, rtol=1e-5))

    t0 = time.perf_counter()
    for _ in range(args.repeats):
        tiled_restore(fwd, img, args.crop, args.crop, batch_size=n_dev,
                      mesh=mesh)
    dt = (time.perf_counter() - t0) / args.repeats
    print(json.dumps({
        "devices": n_dev,
        "tiles": n_tiles,
        "tile": f"{args.crop}x{args.crop}",
        "sharded_ok": sharded_ok,
        "match_single_device": match,
        "tiles_per_sec": round(n_tiles / dt, 2),
        "model": "fdn-shallow" if virtual else "fdn",
        "wallclock_valid": not virtual,
    }))


if __name__ == "__main__":
    main()
