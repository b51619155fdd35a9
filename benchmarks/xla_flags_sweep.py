"""XLA compiler-flag sweep on the bf16 serving forward (round 4).

The r4 perf triage (OPTIMIZATIONS.md) closed every USER-PROGRAM lever
and bounded the remaining gap as "XLA's conv lowering + layout
assignment, below the user-program level". XLA_FLAGS are the one
user-accessible knob INTO that level, and no flag configuration was
ever measured. This sweep times the full bf16 serving forward
(LPNet + restore, 1120x640 — same program as bench.py's headline) under
a small set of public TPU flag configs, one subprocess per config
(flags must be set before jax initializes; a changed flag set also
changes the compile-cache key, so each config pays its own cold
compile — the sweep uses a throwaway /tmp cache to keep the committed
.xla_cache_tpu/ clean).

Flag choices map to the triage's diagnosis:
  * scoped_vmem_limit_kib raise  -> bigger fusions, fewer HBM round
    trips (the program is VPU/byte bound, copies are 27% of bytes)
  * latency_hiding_scheduler     -> overlap the serialized layout DMAs
    the byte audit attributes ~890 ms of span time to
  * jf_conv_input_fusion=false   -> alter what XLA fuses into the
    grouped convs (the #1 time producer with its layout copies)

Flag transport (measured, round 4): the axon client's XLA_FLAGS parser
rejects every TPU-specific flag ("Unknown flag in XLA_FLAGS" — the
client XLA build doesn't know the libtpu flag set), but BOTH of these
reach the remote TPU compiler:
  * LIBTPU_INIT_ARGS: "proto-backed xla_* flags are forwarded
    per-compile" (axon_host log) — verified by
    --xla_tpu_scoped_vmem_limit_kib=16 producing a real scoped-VMEM OOM
    server-side;
  * per-jit compiler_options={...} via .lower().compile() — verified by
    a bogus option name being rejected by the remote tpu_compile_helper.
The sweep uses LIBTPU_INIT_ARGS. Because the flags ride outside jax's
compile-cache key, every config gets its own throwaway cache dir so
configs can't poison each other.

Usage: python benchmarks/xla_flags_sweep.py [--out artifacts/...json]
       python benchmarks/xla_flags_sweep.py --child  (internal)
"""

import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
H, W = 640, 1120
ITERS = 6

CONFIGS = {
    "base": "",
    # vmem_98k (--xla_tpu_scoped_vmem_limit_kib=98304): compile does not
    # finish in 25 min (MSA/fusion search explosion) — recorded as a
    # timeout in the artifact; higher values and combos pruned.
    "vmem_98k": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "lhs": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "no_conv_input_fusion": "--xla_jf_conv_input_fusion=false",
    "dot_dot_fusion_dup": "--xla_tpu_dot_dot_fusion_duplicated=true",
    "aggressive_fusion": "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true",
}


def _child():
    """Measure one config in this process; print one JSON line."""
    os.environ["FDN_BENCH_DTYPE"] = "bfloat16"
    os.environ["FDN_SCAN_UNROLL"] = "5"
    sys.path.insert(0, os.path.join(_HERE, ".."))

    import numpy as np
    import jax
    import jax.numpy as jnp

    from fdn_tip2025_tpu.models import init_fdn, fdn_forward, init_ipredict
    from fdn_tip2025_tpu.models.ipredict import ipredict_forward

    rng = np.random.default_rng(0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    fdn_params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, init_fdn(k1))
    lp_params = init_ipredict(k2)
    x = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32), jnp.bfloat16)

    @jax.jit
    def fwd(fp, lp, x):
        ratio = ipredict_forward(lp, x.astype(jnp.float32))
        return fdn_forward(fp, x, ratio.astype(x.dtype))[0]

    t0 = time.perf_counter()
    fwd(fdn_params, lp_params, x).block_until_ready()
    compile_s = time.perf_counter() - t0
    fwd(fdn_params, lp_params, x).block_until_ready()

    ts = []
    for _ in range(ITERS):
        t1 = time.perf_counter()
        fwd(fdn_params, lp_params, x).block_until_ready()
        ts.append(time.perf_counter() - t1)
    dt = sorted(ts)[len(ts) // 2]
    # tunnel-sync guard (see bench.py)
    t1 = time.perf_counter()
    float(fwd(fdn_params, lp_params, x)[0, 0, 0, 0])
    if time.perf_counter() - t1 > 2 * dt:
        ts = []
        for _ in range(ITERS):
            t1 = time.perf_counter()
            float(fwd(fdn_params, lp_params, x)[0, 0, 0, 0])
            ts.append(time.perf_counter() - t1)
        dt = sorted(ts)[len(ts) // 2]
    print(json.dumps({"mps": round((H * W / 1e6) / dt, 3),
                      "compile_s": round(compile_s, 1)}))


def main():
    if "--child" in sys.argv:
        _child()
        return
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    results = {}
    if out_path and os.path.exists(out_path):  # resume an aborted sweep
        with open(out_path) as f:
            results = json.load(f)
    retry_errors = "--retry-errors" in sys.argv
    for name, flags in CONFIGS.items():
        if name in results:
            prior = results[name].get("mps")
            if prior is None and retry_errors:
                print(f"{name:22s} retrying "
                      f"(prior: {results[name].get('error')})", flush=True)
            else:
                print(f"{name:22s} "
                      + (f"{prior:.3f} MP/s (cached)" if prior is not None
                         else f"skipped (prior error; --retry-errors "
                              f"re-runs): {results[name].get('error')}"),
                      flush=True)
                continue
        env = dict(os.environ)
        base_flags = env.get("LIBTPU_INIT_ARGS", "")
        env["LIBTPU_INIT_ARGS"] = (base_flags + " " + flags).strip()
        env["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/xla_sweep_cache_{name}"
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__), "--child"],
                env=env, cwd=os.path.join(_HERE, ".."),
                capture_output=True, text=True,
                timeout=float(os.environ.get("FDN_SWEEP_CHILD_TIMEOUT", "1500")))
        except subprocess.TimeoutExpired:
            results[name] = {"error": "child timeout (compile did not "
                             "finish)", "flags": flags}
            print(f"{name:22s} TIMEOUT", flush=True)
            if out_path:
                with open(out_path, "w") as f:
                    json.dump(results, f, indent=1)
            continue
        wall = time.perf_counter() - t0
        if proc.returncode != 0:
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
            results[name] = {"error": " | ".join(tail)[-300:],
                             "flags": flags}
            print(f"{name:22s} FAILED ({wall:.0f}s): "
                  f"{results[name]['error'][:120]}", flush=True)
            if out_path:
                with open(out_path, "w") as f:
                    json.dump(results, f, indent=1)
            continue
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        rec["flags"] = flags
        results[name] = rec
        print(f"{name:22s} {rec['mps']:.3f} MP/s "
              f"(compile {rec['compile_s']:.0f}s, wall {wall:.0f}s)",
              flush=True)
        if out_path:
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)

    print(json.dumps(results), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
