#!/usr/bin/env python
"""Profile a jitted forward on the live backend and print the top device
ops (per-op ms and % of device time) — the framework's tracing tool
(SURVEY.md §5: the reference has wall-clock timing only).

  python tools/profile_forward.py --what fdn --height 640 --width 1120
  python tools/profile_forward.py --what fdsa --dim 32
"""

import argparse
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="fdn",
                    choices=["fdn", "fdsa", "fdffn", "fcaffn", "mar"])
    ap.add_argument("--height", type=int, default=640)
    ap.add_argument("--width", type=int, default=1120)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from fdn_tip2025_tpu.utils.xplane import summarize

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    dt = jnp.dtype(args.dtype)
    B, H, W, D = 1, args.height, args.width, args.dim

    if args.what == "fdn":
        from fdn_tip2025_tpu.models import init_fdn, fdn_forward
        params = init_fdn(key)
        if dt != jnp.float32:
            params = jax.tree.map(lambda a: a.astype(dt)
                                  if a.dtype == jnp.float32 else a, params)
        x = jnp.asarray(rng.random((B, H, W, 3)), dt)
        r = jnp.asarray([[0.5]], dt)
        fn = jax.jit(lambda p, x, r: fdn_forward(p, x, r)[0])
        fargs = (params, x, r)
    elif args.what == "mar":
        from fdn_tip2025_tpu.models import init_mar, mar_forward
        params = init_mar(key)
        x = jnp.asarray(rng.random((B, H, W, 3)), dt)
        r = jnp.full((B, 1, 1, 1), 0.5, dt)
        fn = jax.jit(lambda p, x, r: mar_forward(p, x, r)[2])
        fargs = (params, x, r)
    else:
        from fdn_tip2025_tpu.nn.attention import init_fdsa, fdsa
        from fdn_tip2025_tpu.nn.ffn import (
            init_fdffn, fdffn, init_fcaffn, fcaffn,
        )
        def cast(p):
            if dt == jnp.float32:
                return p
            return jax.tree.map(lambda a: a.astype(dt)
                                if a.dtype == jnp.float32 else a, p)

        x = jnp.asarray(rng.random((B, H, W, D)), dt)
        if args.what == "fdsa":
            params = cast(init_fdsa(key, D))
            fn = jax.jit(fdsa)
            fargs = (params, x)
        elif args.what == "fdffn":
            params = cast(init_fdffn(key, D))
            fn = jax.jit(fdffn)
            fargs = (params, x)
        else:
            params = cast(init_fcaffn(key, D))
            wf = W // 2 + 1
            xh = jnp.asarray(rng.random((B, H, wf, 3)), dt)
            xp = jnp.asarray(rng.random((B, H, wf, 3)), dt)
            xi = jnp.asarray(rng.random((B, H, W, 3)), dt)
            fn = jax.jit(lambda p, x, a, b, c: fcaffn(p, x, a, b, c))
            fargs = (params, x, xh, xp, xi)

    out = fn(*fargs)
    jax.tree.map(lambda a: a.block_until_ready(), out)

    logdir = args.logdir or tempfile.mkdtemp(prefix="fdnprof_")
    jax.profiler.start_trace(logdir)
    for _ in range(args.steps):
        out = fn(*fargs)
    _ = np.asarray(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    rows = summarize(paths[0], plane_filter="TPU", top=args.top,
                     steps=args.steps)
    if not rows:
        rows = summarize(paths[0], plane_filter="", top=args.top,
                         steps=args.steps)
    print(f"top device ops ({args.what}, {args.steps} steps):")
    for name, ms, pct in rows:
        print(f"{ms:9.3f} ms {pct:5.1f}%  {name[:140]}")


if __name__ == "__main__":
    main()
