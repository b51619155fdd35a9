"""X3 vs HIGHEST: accuracy + speed of the full-image DFT matmuls."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

H, W, C = 640, 1120, 32
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1,H,W,C), dtype=np.float32)) - 0.5
M = jnp.asarray(np.cos(np.outer(np.arange(H), np.arange(H))*2*np.pi/H).astype(np.float32))

def mk(p):
    def f(x):
        return jnp.einsum("hu,bhwc->buwc", M, x, precision=p)
    return jax.jit(f)

ref = np.einsum("hu,bhwc->buwc", np.asarray(M, np.float64), np.asarray(x, np.float64))
outs = {}
for name, p in [("HIGHEST", lax.Precision.HIGHEST),
                ("X3", lax.DotAlgorithmPreset.BF16_BF16_F32_X3),
                ("X6", lax.DotAlgorithmPreset.BF16_BF16_F32_X6),
                ("DEFAULT", None)]:
    try:
        f = mk(p)
        o = f(x); o.block_until_ready()
        t0 = time.perf_counter()
        y = x
        for _ in range(20):
            y = f(y) * 1e-3  # keep magnitudes sane, chain to defeat async
        y.block_until_ready(); _ = np.asarray(y[0,0,0,0])
        dt = (time.perf_counter()-t0)/20*1e3
        err = float(np.max(np.abs(np.asarray(o,np.float64)-ref))/np.max(np.abs(ref)))
        print(f"{name:8s} {dt:7.3f} ms  rel-err {err:.2e}")
    except Exception as e:
        print(name, "FAILED:", str(e)[:120])
