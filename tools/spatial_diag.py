#!/usr/bin/env python
"""Diagnose the full-depth spatial-sharding divergence (VERDICT-r3 #3).

tests/test_spatial_trained.py fails: H-sharded full-depth FDN vs the
unsharded program differs by max-abs ~3e-3 with smoke-trained weights,
the same magnitude as the shallow random-weight gate. Two hypotheses:

  (a) intrinsic chaos amplification — the 60-iter smoke-trained weights
      are still near the chaotic random-init regime, and ANY ulp-level
      perturbation (GSPMD reduction-order shifts included) blows up to
      ~1e-3 through the 44-block phase algebra;
  (b) a real GSPMD bug (conv halo width, full-image DFT collective,
      bilinear resize at shard edges) in the deep program.

The decisive control: compare the sharded-vs-unsharded error against the
unsharded program's OWN sensitivity to a 1-ulp-scale input perturbation,
at the same weight state. If |sharded - ref| ~ |perturbed - ref|, the
divergence is (a) and the honest gate is a perturbation-relative bound;
if sharded error >> perturbation error, it is (b) — then bisect (MAR-only
outputs, W- vs H-sharding, shard-count scaling, training length).

Run on the virtual CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/spatial_diag.py [--iters 60] [--reuse]

Ref obligation: SURVEY §2.8 spatial row; the reference's tiling analog is
image_restoration_model.py:261-339.
"""

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".xla_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from fdn_tip2025_tpu.parallel.mesh import make_mesh  # noqa: E402
from fdn_tip2025_tpu.models import fdn_forward  # noqa: E402


def stats(a, b):
    d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
    return {"max_abs": float(d.max()), "mean_abs": float(d.mean())}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--reuse", action="store_true",
                    help="reuse cached trained params if present")
    ap.add_argument("--pth", default=None,
                    help="skip the smoke-train: load FDN params from this "
                         ".pth export (e.g. tools/cross_check.py's 300-"
                         "iter output) to measure the chaos/sharding "
                         "envelope at a better-converged weight state")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cache = f"/tmp/spatial_diag_params_i{args.iters}.pkl"
    t0 = time.time()
    if args.pth:
        from fdn_tip2025_tpu.checkpoint import load_model_from_pth
        from fdn_tip2025_tpu.models import init_fdn
        params = load_model_from_pth(
            args.pth, init_fdn(jax.random.PRNGKey(0)))
        print(f"loaded params from {args.pth}", flush=True)
    elif args.reuse and os.path.exists(cache):
        with open(cache, "rb") as f:
            params = pickle.load(f)
        print(f"reusing trained params from {cache}", flush=True)
    else:
        from tools.cross_check import train_fdn
        tr, losses = train_fdn(iters=args.iters, size=32, batch=2,
                               lr=1e-3, log_every=20)
        print(f"trained {args.iters} iters: loss {losses[0]:.4f} -> "
              f"{losses[-1]:.4f} ({time.time() - t0:.0f}s)", flush=True)
        params = jax.tree.map(np.asarray, tr.params)
        with open(cache, "wb") as f:
            pickle.dump(params, f)

    from tools.cross_check import synth_pair
    lq = synth_pair(np.random.default_rng(5), 256)[0][:, :64]
    x = jnp.asarray(lq[None])          # (1, 256, 64, 3): H=8x32
    ratio = jnp.asarray([[0.35]], jnp.float32)

    fwd = jax.jit(lambda p, x, r: fdn_forward(p, x, r))
    ref_all = fwd(params, x, ratio)
    ref = np.asarray(ref_all[0])
    ref_mar = np.asarray(ref_all[1])
    print(f"unsharded ref done ({time.time() - t0:.0f}s)", flush=True)

    results = {}

    # control: unsharded sensitivity to ulp-scale input perturbations
    rng = np.random.default_rng(7)
    for eps in (1e-7, 1e-6):
        xp = x + jnp.asarray(
            rng.standard_normal(x.shape, np.float32) * eps)
        pa = fwd(params, xp, ratio)
        results[f"perturb_{eps:.0e}"] = {
            "out": stats(pa[0], ref), "mar": stats(pa[1], ref_mar)}
        print(f"perturb {eps:.0e}: {results[f'perturb_{eps:.0e}']}",
              flush=True)

    # sharded runs: H over 2/4/8 devices, W over 8
    for n, spec, name in ((8, P(None, "data", None, None), "H8"),
                          (2, P(None, "data", None, None), "H2"),
                          (4, P(None, "data", None, None), "H4"),
                          (8, P(None, None, "data", None), "W8")):
        mesh = make_mesh(n)
        xs = jax.device_put(x, NamedSharding(mesh, spec))
        ps = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P())), params)
        out_all = jax.jit(lambda p, x, r: fdn_forward(p, x, r))(
            ps, xs, ratio)
        results[f"sharded_{name}"] = {
            "out": stats(out_all[0], ref), "mar": stats(out_all[1], ref_mar)}
        print(f"sharded {name}: {results[f'sharded_{name}']} "
              f"({time.time() - t0:.0f}s)", flush=True)

    record = {"what": "spatial divergence diagnosis (VERDICT-r3 #3)",
              "iters": args.iters, "pth": args.pth, "input_hw": [256, 64],
              "results": results,
              "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(record, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
