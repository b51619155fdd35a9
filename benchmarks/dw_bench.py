"""Depthwise conv: XLA conv (DEFAULT/X6) vs explicit 9-shift VPU stencil."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

H, W, C = 640, 1120, 152
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.random((1,H,W,C), dtype=np.float32)) - 0.5
w = jnp.asarray(rng.random((3,3,1,C), dtype=np.float32)) - 0.5

def conv(p):
    def f(x):
        return lax.conv_general_dilated(x, w, (1,1), [(1,1),(1,1)],
            dimension_numbers=("NHWC","HWIO","NHWC"), feature_group_count=C,
            precision=p) * 0.5
    return jax.jit(f)

@jax.jit
def stencil(x):
    xp = jnp.pad(x, ((0,0),(1,1),(1,1),(0,0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            t = lax.dynamic_slice(xp, (0,dy,dx,0), (1,H,W,C)) * w[dy,dx,0]
            out = t if out is None else out + t
    return out * 0.5

ref = None
for name, f in [("conv DEFAULT", conv(None)),
                ("conv X6", conv(lax.DotAlgorithmPreset.BF16_BF16_F32_X6)),
                ("stencil f32", stencil)]:
    o = f(x0); o.block_until_ready()
    if ref is None or name == "conv X6":
        pass
    t0 = time.perf_counter()
    y = x0
    for _ in range(10):
        y = f(y)
    y.block_until_ready(); _ = np.asarray(y[0,0,0,0])
    dt = (time.perf_counter()-t0)/10*1e3
    err = float(jnp.max(jnp.abs(o - stencil(x0))) / jnp.max(jnp.abs(stencil(x0))))
    print(f"{name:14s} {dt:7.2f} ms  rel-vs-stencil {err:.2e}")
