"""End-to-end A/B of the channel-major level-1 block pipeline
(nn/cm_block.py, VERDICT-r4 #1) on the full bf16 serving program.

Times the complete FDN forward (LPNet ratio included) at the LOL-Blur
test resolution 1120x640 with FDN_CM_LEVEL1 unset (NHWC blocks) vs =1
(NCHW level-1 chains), in one process, and checks the outputs agree.

At random-init weights the restore tail amplifies ulp differences ~3e6x
(benchmarks/artifacts/spatial_diag_r4.json), so the numeric comparison
is only meaningful with --pth trained weights; a 1-ulp input-flip
control on the baseline path is reported either way.

Usage: python benchmarks/cm_e2e_ab.py [--out artifacts/cm_e2e_r5.json]
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


def measure(cm_level1, pth=None, perturb=False):
    if cm_level1:
        os.environ["FDN_CM_LEVEL1"] = "1"
    else:
        os.environ.pop("FDN_CM_LEVEL1", None)
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

    # init under ONE jit: eager init through the axon tunnel is
    # seconds-per-op (bench.py round-5 note)
    @jax.jit
    def make_params():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        return init_fdn(k1), init_ipredict(k2)

    fdn_params, lp_params = make_params()
    if pth:
        from fdn_tip2025_tpu.checkpoint import load_model_from_pth
        fdn_params = load_model_from_pth(pth, jax.device_get(fdn_params))
    fdn_params = jax.jit(
        lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                               if a.dtype == jnp.float32 else a, t)
    )(fdn_params)
    xin = rng.random((1, H, W, 3), dtype=np.float32)
    if perturb:  # 1-bf16-ulp relative flip: chaos floor for base-vs-base
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

    # chained-slope timing (see bench.py round-5 note: block_until_ready
    # lies through the tunnel and eager element fetches can hang)
    sync = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))

    def chain_time(n):
        t1 = time.perf_counter()
        y = x
        for _ in range(n):
            y = fwd(fdn_params, lp_params, y)
        float(sync(y))
        return time.perf_counter() - t1

    chain_time(1)
    t_short = min(chain_time(2), chain_time(2))
    t_long = min(chain_time(2 + ITERS), chain_time(2 + ITERS))
    dt = max((t_long - t_short) / ITERS, 1e-9)

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
    mps_base, c_base, out_base = measure(False, pth)
    print(f"NHWC blocks:       {mps_base:.3f} MP/s (compile {c_base:.0f}s)",
          flush=True)
    mps_cm, c_cm, out_cm = measure(True, pth)
    print(f"NCHW level-1 (CM): {mps_cm:.3f} MP/s (compile {c_cm:.0f}s)",
          flush=True)
    _, _, out_ctl = measure(False, pth, perturb=True)
    print("chaos control (base, 1-ulp input flip) done", flush=True)

    diff = np.abs(out_cm - out_base)
    ctl = np.abs(out_ctl - out_base)
    rec = {
        "shape": [H, W],
        "pth": pth,
        "base_mps": round(mps_base, 3),
        "cm_mps": round(mps_cm, 3),
        "speedup": round(mps_cm / mps_base, 3),
        "max_abs": float(diff.max()),
        "psnr_vs_base_db": _psnr(out_cm, out_base),
        "control_max_abs": float(ctl.max()),
        "control_psnr_db": _psnr(out_ctl, out_base),
    }
    print(json.dumps(rec), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
