"""End-to-end A/B of the Pallas depthwise-conv stencil kernels on the
full bf16 serving program (VERDICT r3 #2).

Times the complete FDN forward (LPNet ratio included) at the LOL-Blur
test resolution 1120x640 with FDN_PALLAS_DW unset (XLA dwconvs) vs =1
(kernels/dwconv.py stencils inside FDSA + FDFFN), in one process, and
checks the two outputs agree to bf16 serving accuracy.

At random-init weights the restore tail amplifies 1-ulp differences
~3e6x (benchmarks/artifacts/spatial_diag_r4.json), so the numeric
comparison is only meaningful with --pth trained weights (e.g.
tools/cross_check.py's 300-iter export), where chaos collapses
(spatial_diag_r4_trained.json); a 1-ulp input-perturbation control on
the XLA path is reported either way so the kernel diff can be read
against the program's own sensitivity.

Usage: python benchmarks/dw_e2e_ab.py [--out artifacts/dw_e2e_r4.json]
                                      [--pth path/to/fdn.pth]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

H, W = 640, 1120
ITERS = 8


def measure(pallas_dw, pth=None, perturb=False):
    if pallas_dw:
        os.environ["FDN_PALLAS_DW"] = "1"
    else:
        os.environ.pop("FDN_PALLAS_DW", None)
    os.environ["FDN_BENCH_DTYPE"] = "bfloat16"
    os.environ["FDN_SCAN_UNROLL"] = "5"

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".xla_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from fdn_tip2025_tpu.models import init_fdn, fdn_forward, init_ipredict
    from fdn_tip2025_tpu.models.ipredict import ipredict_forward

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    fdn_params = init_fdn(k1)
    if pth:
        from fdn_tip2025_tpu.checkpoint import load_model_from_pth
        fdn_params = load_model_from_pth(pth, fdn_params)
    fdn_params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, fdn_params)
    lp_params = init_ipredict(k2)
    xin = rng.random((1, H, W, 3), dtype=np.float32)
    if perturb:  # 1-bf16-ulp relative flip: chaos floor for XLA-vs-XLA
        xin = xin * (1.0 + 2.0 ** -8)
    x = jnp.asarray(xin, jnp.bfloat16)

    @jax.jit
    def fwd(fp, lp, x):
        ratio = ipredict_forward(lp, x.astype(jnp.float32))
        return fdn_forward(fp, x, ratio.astype(x.dtype))[0]

    t0 = time.perf_counter()
    out = fwd(fdn_params, lp_params, x)
    out.block_until_ready()
    compile_s = time.perf_counter() - t0
    fwd(fdn_params, lp_params, x).block_until_ready()

    def timed(sync):
        ts = []
        for _ in range(ITERS):
            t1 = time.perf_counter()
            sync(fwd(fdn_params, lp_params, x))
            ts.append(time.perf_counter() - t1)
        return sorted(ts)[len(ts) // 2]

    dt = timed(lambda o: o.block_until_ready())
    # tunnel-sync guard (see bench.py): Pallas custom calls have been
    # observed to return from block_until_ready before execution
    t1 = time.perf_counter()
    float(fwd(fdn_params, lp_params, x)[0, 0, 0, 0])
    if time.perf_counter() - t1 > 2 * dt:
        dt = timed(lambda o: float(o[0, 0, 0, 0]))

    return (H * W / 1e6) / dt, compile_s, np.asarray(out, np.float32)


def _psnr(a, b):
    import numpy as np
    mse = float(((a - b) ** 2).mean())
    return round(10 * np.log10(1.0 / mse), 1) if mse > 0 else None


def main():
    out_path = pth = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    if "--pth" in sys.argv:
        pth = sys.argv[sys.argv.index("--pth") + 1]

    import numpy as np
    mps_xla, c_xla, out_xla = measure(False, pth)
    print(f"XLA dwconv:    {mps_xla:.3f} MP/s (compile {c_xla:.0f}s)",
          flush=True)
    mps_pal, c_pal, out_pal = measure(True, pth)
    print(f"Pallas dwconv: {mps_pal:.3f} MP/s (compile {c_pal:.0f}s)",
          flush=True)
    _, _, out_ctl = measure(False, pth, perturb=True)
    print("chaos control (XLA, 1-ulp input flip) done", flush=True)

    diff = np.abs(out_pal - out_xla)
    ctl = np.abs(out_ctl - out_xla)
    rec = {
        "shape": [H, W],
        "pth": pth,
        "xla_mps": round(mps_xla, 3),
        "pallas_mps": round(mps_pal, 3),
        "speedup": round(mps_pal / mps_xla, 3),
        "max_abs": float(diff.max()),
        "psnr_vs_xla_db": _psnr(out_pal, out_xla),
        "control_max_abs": float(ctl.max()),
        "control_psnr_db": _psnr(out_ctl, out_xla),
    }
    print(json.dumps(rec), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
