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
    return jax.default_backend()
