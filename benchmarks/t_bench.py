"""Microbench: patchify/layout strategies, chained-call timing protocol."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

C, H, W = 152, 640, 1120
hb, wb, N = H//8, W//8, (H//8)*(W//8)
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.random((1,H,W,C), dtype=np.float32))
Wf = jnp.asarray(rng.random((80,64), dtype=np.float32))
Ai = jnp.asarray(rng.random((64,80), dtype=np.float32))
wdw = jnp.asarray(rng.random((3,3,1,C), dtype=np.float32))
HI = lax.Precision.HIGHEST

def dw(x, out_nchw=False):
    return lax.conv_general_dilated(x, wdw, (1,1), [(1,1),(1,1)],
        dimension_numbers=("NHWC","HWIO","NCHW" if out_nchw else "NHWC"),
        feature_group_count=C)

def seg_a(x):  # dwconv NHWC + 6-D transpose to (C,64,N), round trip
    h = dw(x)
    p = h.reshape(1,hb,8,wb,8,C).transpose(5,2,4,0,1,3).reshape(C,64,N)
    f = jnp.einsum("fk,ckn->cfn", Wf, p, precision=HI)
    f = f * 1.0001
    o = jnp.einsum("kf,cfn->ckn", Ai, f, precision=HI)
    return o.reshape(C,8,8,1,hb,wb).transpose(3,4,1,5,2,0).reshape(1,H,W,C)

def seg_b(x):  # dwconv -> NCHW + in-CHW patchify
    h = dw(x, out_nchw=True).reshape(C,H,W)
    p = h.reshape(C,hb,8,wb,8).transpose(0,2,4,1,3).reshape(C,64,N)
    f = jnp.einsum("fk,ckn->cfn", Wf, p, precision=HI)
    f = f * 1.0001
    o = jnp.einsum("kf,cfn->ckn", Ai, f, precision=HI)
    o = o.reshape(C,8,8,hb,wb).transpose(0,3,1,4,2).reshape(1,C,H,W)
    return o.transpose(0,2,3,1)  # back to NHWC to close the chain

def seg_c(x):  # control: old NHWC patch path (..., 8,5,C planes)
    h = dw(x)
    p = h.reshape(1,hb,8,wb,8,C).transpose(0,1,3,2,4,5)  # (1,hb,wb,8,8,C)
    flat = p.reshape(1,hb,wb,64,C)
    f = jnp.einsum("fk,bijkc->bijfc", Wf, flat, precision=HI)
    f = f * 1.0001
    o = jnp.einsum("kf,bijfc->bijkc", Ai, f, precision=HI)
    o = o.reshape(1,hb,wb,8,8,C).transpose(0,1,3,2,4,5).reshape(1,H,W,C)
    return o

def seg_d(x):  # dwconv NHWC + DFT-absorbed transpose (einsum from 6-D view)
    h = dw(x)
    x6 = h.reshape(1,hb,8,wb,8,C)
    Wpq = Wf.reshape(80,8,8)
    f = jnp.einsum("bipjqc,fpq->cfbij", x6, Wpq, precision=HI).reshape(C,80,N)
    f = f * 1.0001
    Apq = Ai.reshape(8,8,80)
    o = jnp.einsum("cfn,pqf->cpqn", f.reshape(C,80,N), Apq, precision=HI)
    o = o.reshape(C,8,8,1,hb,wb).transpose(3,4,1,5,2,0).reshape(1,H,W,C)
    return o

for name, g in [("A dwNHWC+6Dtrans", seg_a), ("B dwNCHW+chw-patch", seg_b),
                ("C old NHWC planes", seg_c), ("D DFT-absorbed", seg_d)]:
    gj = jax.jit(g)
    x = gj(x0); x.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        x = gj(x)
    x.block_until_ready()
    _ = np.asarray(x[0,0,0,0])
    print(f"{name:22s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms/iter")
