#!/usr/bin/env python
"""Per-op HBM byte attribution of the bench forward (VERDICT-r2 #1).

tools/roofline.py gives the WHOLE-program bytes-accessed number; this
tool breaks it down per executed device op so the top byte producers can
be ranked and attacked individually:

  1. compile the exact bench.py forward (mode via FDN_BENCH_MODE),
  2. parse the optimized HLO for every instruction's operand/output
     shapes -> bytes accessed per execution (operands + outputs, the
     same convention XLA's cost analysis uses at fusion granularity),
  3. profile N steps on the device and join per-op measured time and
     execution counts (lax.scan body ops show real trip counts) against
     those byte counts,
  4. print the top rows by device time with bytes/step and effective
     GB/s, plus a per-category rollup.

Effective GB/s near the HBM ceiling (~819 GB/s on v5e) means the op is
already bandwidth-optimal and only FEWER bytes can help; far below the
ceiling means latency/dependency/compute bound — moving bytes won't.

  python tools/byte_audit.py --dtype bfloat16 --steps 4 --top 30
"""

import argparse
import glob
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
    "c64": 8, "c128": 16,
}

# one HLO shape: dtype[d0,d1,...]{layout} (layout optional, dims optional)
_SHAPE_RE = re.compile(r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([\d,]*)\]")


def _shape_bytes(m):
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


def parse_hlo_bytes(hlo_text):
    """{instruction_name: bytes_accessed_per_execution}.

    For each instruction line `%name = <shape> opcode(<operand shapes>)`,
    bytes = output shape(s) + operand shapes as printed. HLO text prints
    operand shapes inline, so no cross-referencing is needed; tuple
    outputs count every leaf. Constants/parameters are skipped (no
    execution); (get-tuple-element|bitcast|parameter|constant) are free.
    """
    out = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?%?([\w.\-]+) = ", line)
        if not m:
            continue
        name = m.group(1)
        op = line[m.end():]
        if re.match(r"(\(|)(\w+\[)", op) is None and "(" not in op:
            continue
        opcode_m = re.search(r"\}?\s*(\w[\w\-]*)\(", op)
        opcode = opcode_m.group(1) if opcode_m else ""
        if opcode in ("parameter", "constant", "get-tuple-element",
                      "bitcast", "tuple", "after-all"):
            continue
        total = sum(_shape_bytes(s) for s in _SHAPE_RE.finditer(line))
        sm = re.search(r'op_name="([^"]*)"', line)
        out[name] = (total, sm.group(1) if sm else None)
    return out


def src_label(op_name):
    """Collapse an HLO op_name path ("jit(fwd)/jit(main)/.../transpose")
    to its trailing primitive + nearest named scope — the rollup key for
    the VPU-time triage (which SOURCE op class produces fusion time)."""
    if not op_name:
        return None
    parts = [p for p in op_name.split("/") if p and not p.startswith("jit(")]
    if not parts:
        return op_name.rsplit("/", 1)[-1]
    prim = re.sub(r"\[.*", "", parts[-1])  # strip params e.g. dot_general[...]
    scope = parts[-2] if len(parts) > 1 else ""
    return f"{scope}/{prim}" if scope else prim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--height", type=int, default=640)
    ap.add_argument("--width", type=int, default=1120)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--save-hlo", default=None,
                    help="gzip the optimized HLO text here for offline "
                         "shape/source analysis of the profiled ops")
    args = ap.parse_args()

    if args.dtype == "bfloat16":
        os.environ.setdefault("FDN_SCAN_UNROLL", "5")  # bench bf16 parity

    import numpy as np
    import jax
    import jax.numpy as jnp

    from fdn_tip2025_tpu.models import init_fdn, fdn_forward, init_ipredict
    from fdn_tip2025_tpu.models.ipredict import ipredict_forward
    from fdn_tip2025_tpu.utils.xplane import op_totals

    H, W = args.height, args.width
    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    # jitted init: eager init_fdn through the axon tunnel is
    # seconds-per-op (bench.py round-5 note — 450 s observed)
    @jax.jit
    def make_params():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        fp = init_fdn(k1)
        if dtype != jnp.float32:
            fp = jax.tree.map(
                lambda a: a.astype(dtype)
                if a.dtype == jnp.float32 else a, fp)
        return fp, init_ipredict(k2)

    fdn_params, lp_params = make_params()
    x = jnp.asarray(rng.random((1, H, W, 3)), dtype)

    def fwd(fp, lp, x):
        ratio = ipredict_forward(lp, x.astype(jnp.float32))
        return fdn_forward(fp, x, ratio.astype(x.dtype))[0]

    print(f"compiling {args.dtype} forward at {H}x{W} ...", flush=True)
    compiled = jax.jit(fwd).lower(fdn_params, lp_params, x).compile()
    hlo = compiled.as_text()
    if args.save_hlo:
        import gzip
        with gzip.open(args.save_hlo, "wt") as f:
            f.write(hlo)
        print(f"wrote {args.save_hlo}")
    bytes_per_exec = parse_hlo_bytes(hlo)
    print(f"parsed {len(bytes_per_exec)} instructions from optimized HLO",
          flush=True)

    out = compiled(fdn_params, lp_params, x)
    out.block_until_ready()
    logdir = tempfile.mkdtemp(prefix="fdnaudit_")
    jax.profiler.start_trace(logdir)
    for _ in range(args.steps):
        out = compiled(fdn_params, lp_params, x)
        time.sleep(3.0)  # pace dispatches; deep queues stall the tunnel
    # jitted-sum sync (an eager element fetch can stall for minutes
    # through the tunnel — bench.py round-5 note)
    float(jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))(out))
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    planes = op_totals(paths[0], None, with_counts=True)
    dev = {n: t for n, t in planes.items() if "TPU" in n} or planes

    rows = []
    for pname, totals in dev.items():
        for nm, (ps, cnt) in totals.items():
            # metadata names may be the full HLO line ("%fusion.7 = bf16[..]
            # fusion(...)"); the instruction name is the leading token
            base = nm.lstrip("%").split(" ")[0].strip()
            if base.startswith("jit_") or ".sunk" in nm:
                continue  # module-level / wide-region spans, not ops
            if base not in bytes_per_exec and base.startswith(
                    "fused_computation."):
                # event named after the called computation, not the fusion
                base = "fusion." + base.split(".", 1)[1]
            b, src = bytes_per_exec.get(base, (None, None))
            ms = ps / 1e9 / args.steps
            execs = cnt / args.steps
            gb = (b or 0) * execs / 1e9
            rows.append({
                "op": base, "ms": round(ms, 3),
                "execs_per_step": round(execs, 2),
                "gb_per_step": round(gb, 3),
                "eff_gbps": round(gb / (ms / 1e3), 1) if ms > 0 and b
                else None,
                "src": src_label(src),
            })
    rows.sort(key=lambda r: -r["ms"])
    total_ms = sum(r["ms"] for r in rows)
    total_gb = sum(r["gb_per_step"] for r in rows)

    def cat(op):
        return re.sub(r"[.\d]+$", "", op)

    cats = {}
    for r in rows:
        c = cats.setdefault(cat(r["op"]), {"ms": 0.0, "gb": 0.0, "n": 0})
        c["ms"] += r["ms"]
        c["gb"] += r["gb_per_step"]
        c["n"] += 1

    print(f"\ndevice total {total_ms:.1f} ms/step, attributed "
          f"{total_gb:.1f} GB/step ({args.dtype} buffers)\n")
    print("top ops by device time:")
    print(f"{'ms':>9} {'x/step':>7} {'GB/step':>8} {'GB/s':>7}  op")
    for r in rows[:args.top]:
        print(f"{r['ms']:9.3f} {r['execs_per_step']:7.1f} "
              f"{r['gb_per_step']:8.3f} "
              f"{r['eff_gbps'] if r['eff_gbps'] is not None else '-':>7}  "
              f"{r['op'][:110]}")
    print("\nby category:")
    for c, v in sorted(cats.items(), key=lambda kv: -kv[1]["ms"])[:15]:
        print(f"{v['ms']:9.3f} ms {v['gb']:8.2f} GB  n={v['n']:<4} {c}")

    srcs = {}
    for r in rows:
        s = srcs.setdefault(r["src"] or "(unattributed)",
                            {"ms": 0.0, "gb": 0.0, "n": 0})
        s["ms"] += r["ms"]
        s["gb"] += r["gb_per_step"]
        s["n"] += 1
    print("\nby source op (fusion-root op_name metadata):")
    for c, v in sorted(srcs.items(), key=lambda kv: -kv[1]["ms"])[:25]:
        print(f"{v['ms']:9.3f} ms {v['gb']:8.2f} GB  n={v['n']:<4} {c}")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"dtype": args.dtype, "steps": args.steps,
                       "total_ms": round(total_ms, 1),
                       "total_gb": round(total_gb, 1),
                       "by_source": {k: {kk: round(vv, 3) if
                                         isinstance(vv, float) else vv
                                         for kk, vv in v.items()}
                                     for k, v in sorted(
                                         srcs.items(),
                                         key=lambda kv: -kv[1]["ms"])},
                       "rows": rows[:200]}, f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
