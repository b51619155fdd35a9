#!/usr/bin/env python
"""XLA compiler-option sweep on the bench.py forward (bf16 serving mode).

The model is HBM-bandwidth bound (roofline.json: ~44% of BW in bf16 at
0.83 MP/s, speed-of-light ~2x away), so the candidate knobs are the ones
that change fusion depth / scheduling, not matmul tuning. Options are
passed per-executable via jit(...).lower(...).compile(compiler_options=)
— XLA_FLAGS env may not reach the tunneled backend's compiler.

Usage:
    python benchmarks/xla_opts_bench.py                # full sweep
    python benchmarks/xla_opts_bench.py --only vmem64  # one entry

Appends one JSON line per config to benchmarks/artifacts/xla_opts.jsonl.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

H, W = 640, 1120
WARMUP = 2
CHAIN = 8

SWEEP = {
    "baseline": {},
    # deeper fusions get more scratch before the fuser bails
    "vmem8": {"xla_tpu_scoped_vmem_limit_kib": "8192"},
    "vmem24": {"xla_tpu_scoped_vmem_limit_kib": "24576"},
    "vmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    # let the fuser keep going past its default cost cutoffs
    "aggr_fusion": {"xla_tpu_enable_aggressive_loop_fusion_layout_opt":
                    "true"},
    "all_gather_fuse": {"xla_tpu_enable_all_experimental_scheduler_features":
                        "true"},
    "flash_sched": {"xla_latency_hiding_scheduler_rerun": "2"},
}


def bench_once(opts):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fdn_tip2025_tpu.models import (
        init_fdn, fdn_forward, init_ipredict,
    )
    from fdn_tip2025_tpu.models.ipredict import ipredict_forward

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    fdn_params = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
        init_fdn(k1))
    lp_params = init_ipredict(k2)
    x = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32), dtype)

    def fwd(fp, lp, x):
        ratio = ipredict_forward(lp, x.astype(jnp.float32))
        return fdn_forward(fp, x, ratio.astype(x.dtype))[0]

    lowered = jax.jit(fwd).lower(fdn_params, lp_params, x)
    t0 = time.perf_counter()
    compiled = lowered.compile(compiler_options=opts or None)
    compile_s = time.perf_counter() - t0

    for _ in range(WARMUP):
        np.asarray(compiled(fdn_params, lp_params, x))
    # chained timing: N enqueued calls + one D2H sync (block_until_ready
    # can return at enqueue through the tunnel — OPTIMIZATIONS.md)
    t0 = time.perf_counter()
    out = None
    for _ in range(CHAIN):
        out = compiled(fdn_params, lp_params, x)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / CHAIN
    return (H * W / 1e6) / dt, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "artifacts", "xla_opts.jsonl"))
    args = ap.parse_args()

    names = [args.only] if args.only else list(SWEEP)
    for name in names:
        opts = SWEEP[name]
        try:
            mps, compile_s = bench_once(opts)
            rec = {"name": name, "opts": opts, "mps": round(mps, 3),
                   "compile_s": round(compile_s, 1)}
        except Exception as e:  # noqa: BLE001 — record and continue sweep
            rec = {"name": name, "opts": opts, "error": repr(e)[:300]}
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
