#!/usr/bin/env python
"""Headline benchmark: FDN inference throughput (megapixels/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "modes"}.
"value" is the pinned headline mode (FDN_BENCH_MODE, default bf16 — keep
it fixed across rounds so the BENCH_r0N series is like-for-like);
"modes" carries all three modes' MP/s as context rows (null if a mode
fails or the FDN_BENCH_BUDGET_S wall-clock budget runs out first).

Protocol (round 5): full FDN forward (LPNet ratio included) at LOL-Blur
test resolution 1120x640 (already x32-aligned), batch 1. Per-iter time
is DEVICE time: one jax.profiler window captures TRACE_ITERS self-fed
chained executions per mode (each mode's program is its own
jit_fwd_<mode> module span; per-execution time = span total / count,
both read from the xplane), with sleep-paced dispatches and NO host
sync anywhere. Why such contortions — every conventional protocol is
broken by the axon tunnel, each verified this round:
  * block_until_ready returns BEFORE execution (bogus ~0 s/iter);
  * Array.is_ready() lies the same way for this program (a 527 MP/s
    "result", caught by the sanity floor);
  * any real D2H fetch — even a jitted-sum scalar — stalls for a
    variable 20-540 s (r4's element-fetch guard did exactly this, and
    the driver killing a stalled run wedged the device for ~1 h);
  * deep outstanding dispatch queues trigger those stall states, so
    dispatches are paced with sleeps (device counters are immune to
    host-side gaps).
Device-counter results were bit-stable across five runs (bf16 0.868 /
fast 0.570 / parity 0.402 MP/s). A fetch-synced chained-slope fallback
(_slope_mps) covers hosts without the profiler (CPU dev runs); its
slope matches the device span (826 ms/iter) when the fetches behave.
Basis note: r2-r4 headline values used per-call wall timing whose
dispatch gap inflated per-iter time; the r4 headline 0.837 MP/s
corresponds to ~0.868 on this basis — cross-round deltas should
compare within one protocol generation.

Default FDN_BENCH_MODE=bf16: the production serving mode, accuracy-
VALIDATED with trained weights in round 2 (43.5 dB PSNR / SSIM 1.00 vs
f32 at this exact resolution — tools/cross_check.py --bf16-size 640,
benchmarks/artifacts/cross_check_r2.json). Mode table on v5e:

    bf16 (default)                     0.87 MP/s  validated serving mode
    fast (FDN_BENCH_MODE=fast)         0.56 MP/s  BENCH_r01 basis (bf16
                                        conv/DFT operand rounding — what
                                        r1's "f32" silently was; same
                                        rounding class as the reference's
                                        cudnn-TF32 default)
    parity (FDN_BENCH_MODE=parity)     0.40 MP/s  f32-exact end to end
                                        (X6 dots, mixed-precision convs)

Batched serving (r1 regression fixed by the channel-major FDSA): bf16
batch 2 = 0.738, batch 4 = 0.719 MP/s AGGREGATE (89%/87% of batch-1 —
batching still costs a little; single image per chip is the optimum).

vs_baseline: the reference publishes NO throughput numbers
(BASELINE.md); the baseline is the PyTorch reference's own
inference_fdn_lolblur.py forward measured on this image's CPU
(torch 2.13 CPU, 1 core) at 320x576 (full-res takes >9 min/forward) — see
tools/measure_torch_baseline.py, result recorded below.
"""

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Reference torch-CPU throughput at 1120x640, measured with
# tools/measure_torch_baseline.py on this image (single core):
TORCH_CPU_MPS = float(os.environ.get("FDN_TORCH_BASELINE_MPS", "0.0007"))

H, W = 640, 1120
TRACE_ITERS = 2        # executions per mode inside the profiler trace
SLOPE_ITERS = 8        # fallback slope span (long chain = 2 + SLOPE_ITERS)
SLOPE_SANITY_MPS = 3.0  # above the HBM bytes floor (~2.4 MP/s): timing lie

# Env knobs a mode sets. They are read at TRACE time inside the ops
# (conv.py / fourier.py / fdformer.py), so one process can measure every
# mode by setting them before building each mode's jit — as long as each
# mode gets a FRESH function object (same-identity functions would hit
# jax's jit cache and silently reuse the first mode's program).
_MODE_ENV = {
    "bf16": {"FDN_BENCH_DTYPE": "bfloat16", "FDN_SCAN_UNROLL": "5"},
    # bf16 conv/DFT operand rounding in f32 — r1's basis
    "fast": {"FDN_CONV_FAST": "1", "FDN_PATCH_DFT_FAST": "1"},
    # f32-exact end to end (X6 dots, mixed-precision convs)
    "parity": {},
}
_MODE_KEYS = sorted({k for env in _MODE_ENV.values() for k in env})


def _progress(msg):
    """Stderr progress (stdout stays the single JSON line): if the
    driver's timeout kills a run, the tail shows which phase hung."""
    print(f"bench: {msg}", file=sys.stderr, flush=True)


_SHARED = {}  # f32 params/input built once, reused by every mode


def _shared_params():
    """f32 params + input, built ONCE for all modes. Eagerly, init_fdn
    is hundreds of separate dispatches, and through the axon tunnel
    eager dispatch is seconds-per-op — measured 452 s of a 484 s bench
    run (round 5; the r3/r4 BENCH null-mode rows trace to exactly
    this). One jitted init program + one tiny cast program for bf16
    (weight VALUES don't affect throughput; re-initializing per mode
    re-loads the 42 MB init executable each time)."""
    if _SHARED:
        return _SHARED
    import numpy as np
    import jax

    from fdn_tip2025_tpu.models import init_fdn, init_ipredict

    @jax.jit
    def make_params():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        return init_fdn(k1), init_ipredict(k2)

    fdn_params, lp_params = make_params()
    rng = np.random.default_rng(0)
    _SHARED.update(p=fdn_params, l=lp_params,
                   x=rng.random((1, H, W, 3), dtype=np.float32))
    return _SHARED


def _setup(mode):
    """Set the mode's env and compile its forward. The jitted function
    is named fwd_<mode> so the modes stay distinguishable in any
    profiler trace (tools/byte_audit.py diagnostics).

    NO host syncs anywhere in setup: every sync through the tunnel can
    cost a variable 20-70 s penalty (the r3/r4 budget killer). Compile
    happens synchronously at the first dispatch; the one queued
    execution drains while later modes compile and is absorbed by the
    timing phase's warm chain.
    """
    t0 = time.perf_counter()
    for k in _MODE_KEYS:
        os.environ.pop(k, None)
    os.environ.update(_MODE_ENV[mode])

    import jax
    import jax.numpy as jnp

    from fdn_tip2025_tpu.models import fdn_forward
    from fdn_tip2025_tpu.models.ipredict import ipredict_forward

    shared = _shared_params()
    # bf16 serving: LPNet stays f32 (see inference.FDNPredictor).
    dtype = jnp.dtype(os.environ.get("FDN_BENCH_DTYPE", "float32"))
    fdn_params, lp_params = shared["p"], shared["l"]
    if dtype != jnp.float32:
        fdn_params = jax.jit(lambda t: jax.tree.map(
            lambda a: a.astype(dtype)
            if a.dtype == jnp.float32 else a, t))(fdn_params)
    x = jnp.asarray(shared["x"], dtype)

    def fwd(fp, lp, x):
        ratio = ipredict_forward(lp, x.astype(jnp.float32))
        return fdn_forward(fp, x, ratio.astype(x.dtype))[0]

    fwd.__name__ = f"fwd_{mode}"
    jfwd = jax.jit(fwd)
    jfwd(fdn_params, lp_params, x)  # compile (sync) + one queued exec
    _progress(f"{mode}: compiled in {time.perf_counter() - t0:.0f}s")
    return {"fwd": jfwd, "p": fdn_params, "l": lp_params, "x": x}


def _sync_fetch(y):
    """Real D2H sync via a jitted scalar sum — the only HONEST
    completion signal this tunnel offers (block_until_ready and
    Array.is_ready() both report completion ~instantly for the full
    serving program; verified against device counters). Can stall for
    tens of seconds, which is why the primary path uses it zero times
    and the fallback only five."""
    import jax
    import jax.numpy as jnp
    return float(jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))(y))


def _device_ms(xplane_path):
    """{mode: device_ms_per_execution} from jit_fwd_<mode> module spans
    on the device plane. Count comes from the xplane itself, so a
    partially-captured window still divides correctly."""
    from fdn_tip2025_tpu.utils.xplane import op_totals
    planes = op_totals(xplane_path, None, with_counts=True)
    agg = {}
    for pname, totals in planes.items():
        if "TPU" not in pname:
            continue
        for nm, (ps, cnt) in totals.items():
            base = nm.lstrip("%").split(" ")[0].strip()
            if not base.startswith("jit_fwd_"):
                continue
            # span names carry a fingerprint suffix: jit_fwd_bf16(119...)
            mode = base[len("jit_fwd_"):].split("(")[0].split(".")[0]
            t, c = agg.get(mode, (0, 0))
            agg[mode] = (t + ps, c + cnt)
    return {m: (ps / 1e9) / cnt for m, (ps, cnt) in agg.items() if cnt}


def _slope_mps(setup, iters):
    """Fallback wall-clock timing: slope between a 2-long and
    (2+iters)-long self-fed chain, each synced by one real fetch —
    constant dispatch/fetch overhead cancels."""

    def chain_time(n):
        t1 = time.perf_counter()
        y = setup["x"]
        for _ in range(n):
            y = setup["fwd"](setup["p"], setup["l"], y)
        _sync_fetch(y)
        return time.perf_counter() - t1

    chain_time(1)  # drain queued work; warm the sync program
    t_short = chain_time(2)
    t_long = chain_time(2 + iters)
    dt = max((t_long - t_short) / iters, 1e-9)
    return (H * W / 1e6) / dt


def main():
    t_start = time.perf_counter()
    budget = float(os.environ.get("FDN_BENCH_BUDGET_S", "420"))
    head = os.environ.get("FDN_BENCH_MODE", "bf16")
    if head not in _MODE_ENV:
        raise SystemExit(f"unknown FDN_BENCH_MODE {head!r}")
    order = [head] + [m for m in ("bf16", "fast", "parity") if m != head]

    import jax

    # Persistent compile cache (same pattern as the dryrun's .xla_cache/):
    # the full serving program takes >9 min to compile cold on a slow
    # 1-core host — warmed entries are committed at .xla_cache_tpu/ so the
    # driver's bench run compiles in seconds (the dominant warm cost is
    # shipping each ~100-230 MB executable to the device through the
    # tunnel). Misses still work, slower.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".xla_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    # Phase 1: compile every mode that fits the budget (headline first).
    # Reserve ~100 s for the trace phase (~35 s of paced execution
    # across all three modes + the xplane pull).
    setups = {}
    t_setup = 90.0  # prior estimate for one warm setup; updated below
    for mode in order:
        remaining = budget - (time.perf_counter() - t_start)
        if setups and remaining < 1.2 * t_setup + 100.0:
            _progress(f"{mode}: skipped (remaining {remaining:.0f}s)")
            continue
        t0 = time.perf_counter()
        try:
            setups[mode] = _setup(mode)
            t_setup = time.perf_counter() - t0
        except Exception as e:  # a failed mode reports null, not a crash
            _progress(f"{mode}: setup FAILED: {e}")

    # Phase 2: one profiler window, NO host sync anywhere. Each mode
    # runs TRACE_ITERS chained executions; sleeps pace the dispatches so
    # the device drains as we go (a deep outstanding queue is what
    # drives the tunnel into its minutes-long stall states), and the
    # final sleep lets the tail finish before stop_trace. Device-counter
    # per-execution time is exact and was bit-stable across five runs
    # (0.868 / 0.570 / 0.402 MP/s); the xplane pull ships ~10-30 MB
    # through the relay (the only heavyweight wire crossing left).
    est_iter_s = {"bf16": 1.0, "fast": 1.6, "parity": 2.6}
    device_ms = {}
    if setups:
        import jax

        logdir = tempfile.mkdtemp(prefix="fdnbench_")
        try:
            jax.profiler.start_trace(logdir)
            for mode, st in setups.items():
                y = st["x"]
                for _ in range(TRACE_ITERS):
                    y = st["fwd"](st["p"], st["l"], y)
                    time.sleep(est_iter_s.get(mode, 3.0))
            time.sleep(8.0)  # drain the tail without a sync
            jax.profiler.stop_trace()
            _progress(f"trace pulled at {time.perf_counter() - t_start:.0f}s")
            paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                              recursive=True)
            if paths:
                device_ms = _device_ms(paths[0])
        except Exception as e:
            _progress(f"profiler path failed ({e}); falling back to "
                      "fetch-synced slope timing")

    modes = {}
    modes_iters = {}
    for mode in ("bf16", "fast", "parity"):
        if mode not in setups:
            modes[mode] = None
            modes_iters[mode] = 0
            continue
        if mode in device_ms:
            modes[mode] = round((H * W / 1e6) / (device_ms[mode] / 1e3), 3)
            modes_iters[mode] = TRACE_ITERS
            continue
        # profiler unavailable (e.g. CPU run) — wall-clock slope
        try:
            mps = _slope_mps(setups[mode], SLOPE_ITERS)
            if mps > SLOPE_SANITY_MPS:
                # faster than the program's HBM bytes floor — the sync
                # lied; null beats a fake number
                _progress(f"{mode}: implausible {mps:.2f} MP/s, nulled")
                modes[mode] = None
                modes_iters[mode] = 0
            else:
                modes[mode] = round(mps, 3)
                modes_iters[mode] = SLOPE_ITERS
        except Exception as e:
            _progress(f"{mode}: timing FAILED: {e}")
            modes[mode] = None
            modes_iters[mode] = 0

    if modes.get(head) is None:
        raise SystemExit(f"headline mode {head!r} failed to measure")
    vs = modes[head] / TORCH_CPU_MPS if TORCH_CPU_MPS > 0 else None
    record = {
        "metric": "fdn_inference_throughput",
        "value": modes[head],
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        # context rows (VERDICT-r2 #8): the headline stays FDN_BENCH_MODE
        # (default bf16) so BENCH_r0N deltas are like-for-like
        "modes": modes,
        # slope span per row so cross-round mode deltas are
        # interpretable (0 = skipped/failed)
        "modes_iters": modes_iters,
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
