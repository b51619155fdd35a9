"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (a tunneled TPU whose
# eager dispatch is seconds-per-op); tests must run on the local CPU with a
# virtual 8-device mesh. jax is already imported at interpreter startup in
# this image, so plain env mutation is not enough — update jax.config too
# (legal as long as no backend has been initialized yet).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Keep matmuls in full f32 on CPU for parity tests.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache (gitignored, unlike the committed dryrun
# cache at .xla_cache/): repeated suite runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".xla_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def assert_close(a, b, atol=1e-5, rtol=1e-5, msg=""):
    a = np.asarray(a)
    b = np.asarray(b)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=msg)
