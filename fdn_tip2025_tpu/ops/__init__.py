"""Functional TPU-native primitives (pure functions on jnp arrays, NHWC)."""

from fdn_tip2025_tpu.ops.fourier import (
    rfft2,
    irfft2,
    replace_denormals,
    amp_phase,
    polar,
    patchify8,
    unpatchify8,
    rfft2_patch8,
    irfft2_patch8,
    rfft2_patch8_flat,
    rfft2_patch8_p40,
    irfft2_patch8_p40,
    irfft2_patch8_flat,
    to_patches_cm,
    to_patches_cm_nchw,
    from_patches_cm,
    rfft2_patch8_cm,
    irfft2_patch8_cm,
    param_cm,
)
from fdn_tip2025_tpu.ops.conv import (
    conv2d,
    conv_transpose2d,
    linear,
    init_conv2d,
    init_conv_transpose2d,
    init_linear,
)
from fdn_tip2025_tpu.ops.norm import (
    layer_norm_2d,
    layer_norm_cm,
    batch_norm_inference,
    init_layer_norm,
)
from fdn_tip2025_tpu.ops.resize import (
    interp_nearest,
    interp_bilinear,
    pixel_unshuffle,
    avg_pool2d,
    global_avg_pool,
)
from fdn_tip2025_tpu.ops.image import (
    grayscale,
    gamma_brighten,
    pad_to_multiple,
    unpad,
    leaky_relu,
    gelu,
)
