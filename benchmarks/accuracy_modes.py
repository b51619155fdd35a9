"""Model-level accuracy: f32-TPU(strict) vs f32-CPU, and bf16-TPU vs
f32-TPU, full FDN forward at 256x320, random weights."""
import os, sys
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from fdn_tip2025_tpu.models import init_fdn, fdn_forward

H, W = 256, 320
rng = np.random.default_rng(0)
x_np = rng.random((1, H, W, 3), dtype=np.float32)
r_np = np.asarray([[0.5]], dtype=np.float32)

cpu = jax.devices("cpu")[0]
tpu = [d for d in jax.devices() if d.platform != "cpu"]
tpu = tpu[0] if tpu else None
print("devices:", jax.devices(), "tpu:", tpu)

with jax.default_device(cpu):
    params = init_fdn(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: np.asarray(a), params)

def run(dev, dtype):
    with jax.default_device(dev):
        p = jax.tree.map(lambda a: jnp.asarray(a, dtype)
                         if a.dtype == np.float32 else jnp.asarray(a), params)
        x = jnp.asarray(x_np, dtype)
        r = jnp.asarray(r_np, dtype)
        out = jax.jit(lambda p, x, r: fdn_forward(p, x, r)[0])(p, x, r)
        return np.asarray(out.astype(jnp.float32))

def psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")

o_cpu = run(cpu, jnp.float32)
print("cpu f32 done", o_cpu.mean())
if tpu is not None:
    o_tpu = run(tpu, jnp.float32)
    print("tpu f32 strict done", o_tpu.mean())
    print(f"PSNR f32-TPU(strict) vs f32-CPU: {psnr(o_tpu, o_cpu):.2f} dB, "
          f"maxabs {np.max(np.abs(o_tpu - o_cpu)):.3e}")
    o_bf = run(tpu, jnp.bfloat16)
    print(f"PSNR bf16-TPU vs f32-TPU: {psnr(o_bf, o_tpu):.2f} dB, "
          f"maxabs {np.max(np.abs(o_bf - o_tpu)):.3e}")
    o_fast = None
