import numpy as np
import jax, jax.numpy as jnp
from jax import lax

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1,64,96,32), dtype=np.float32)) - 0.5
wd = jnp.asarray(rng.random((3,3,32,64), dtype=np.float32)) - 0.5   # dense
wg = jnp.asarray(rng.random((3,3,1,32), dtype=np.float32)) - 0.5    # depthwise

def conv(x, w, g, p):
    return lax.conv_general_dilated(x, w, (1,1), [(1,1),(1,1)],
        dimension_numbers=("NHWC","HWIO","NHWC"), feature_group_count=g,
        precision=p)

# f64 reference on CPU
cpu = jax.devices("cpu")[0]
xe = jax.device_put(x.astype(jnp.float64), cpu)
def ref(w, g):
    return np.asarray(conv(xe, jax.device_put(w.astype(jnp.float64), cpu), g, None))

for name, w, g in [("dense", wd, 1), ("depthwise", wg, 32)]:
    r = ref(w, g)
    for pname, p in [("DEFAULT", None),
                     ("HIGHEST", lax.Precision.HIGHEST),
                     ("X6", lax.DotAlgorithmPreset.BF16_BF16_F32_X6)]:
        try:
            o = np.asarray(conv(x, w, g, p))
            err = np.max(np.abs(o - r)) / np.max(np.abs(r))
            print(f"{name:10s} {pname:8s} rel-err {err:.2e}")
        except Exception as e:
            print(f"{name:10s} {pname:8s} FAILED {str(e)[:80]}")
