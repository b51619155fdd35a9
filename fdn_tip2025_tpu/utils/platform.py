"""Backend selection helper.

This image's sitecustomize imports jax and registers a tunneled TPU
('axon') backend at interpreter startup, so the JAX_PLATFORMS env var set
at process launch is overridden. Selecting a platform therefore requires
jax.config.update *after* import but *before* first backend use.

Usage: call force_platform() as the first thing in a CLI; it honors
--device flags or the FDN_DEVICE env var. Default: leave whatever the
environment provides (TPU in production).
"""

import os

import jax


def force_platform(device=None):
    device = device or os.environ.get("FDN_DEVICE")
    if device:
        jax.config.update("jax_platforms", device)
    enable_compile_cache()
    return jax.default_backend()


def enable_compile_cache():
    """Persistent XLA compile cache for the CLIs: repeated runs (and the
    serving daemon's restarts) skip the multi-minute FDN jit. Keyed by
    HLO + flags + backend, so CPU/TPU entries coexist. Opt out with
    FDN_COMPILE_CACHE=0; override the location with FDN_COMPILE_CACHE=<dir>.
    """
    loc = os.environ.get("FDN_COMPILE_CACHE", "~/.cache/fdn_xla")
    if loc == "0":
        return
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser(loc))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
