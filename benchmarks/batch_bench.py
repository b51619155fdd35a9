"""Batched serving MP/s at the current layouts (journal: batch didn't help in r1)."""
import os, sys, time
os.environ.setdefault("FDN_CONV_FAST", "1")
os.environ.setdefault("FDN_PATCH_DFT_FAST", "1")
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from fdn_tip2025_tpu.models import init_fdn, fdn_forward

H, W = 640, 1120
B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
rng = np.random.default_rng(0)
params = init_fdn(jax.random.PRNGKey(0))
x = jnp.asarray(rng.random((B, H, W, 3), dtype=np.float32))
r = jnp.full((B, 1), 0.4, jnp.float32)
fwd = jax.jit(lambda p, x, r: fdn_forward(p, x, r)[0])
o = fwd(params, x, r); o.block_until_ready()
t0 = time.perf_counter()
n = 6
for _ in range(n):
    o = fwd(params, x, r)
o.block_until_ready(); _ = np.asarray(o[0,0,0,0])
dt = (time.perf_counter()-t0)/n
print(f"batch {B}: {B*H*W/1e6/dt:.3f} MP/s ({dt*1e3:.0f} ms/step)")
