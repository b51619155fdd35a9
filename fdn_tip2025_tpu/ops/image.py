"""Image-space primitives and activation wrappers (NHWC)."""

import jax
import jax.numpy as jnp

# torchvision transforms.Grayscale luminance weights (ITU-R 601-2),
# used by the reference via LPNet_arch.py:104 and
# image_restoration_model.py:140 (gray_trans).
_GRAY_W = (0.2989, 0.587, 0.114)


def grayscale(x):
    """RGB (B,H,W,3) -> (B,H,W,1), torchvision Grayscale semantics."""
    w = jnp.asarray(_GRAY_W, x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def gamma_brighten(x, m, scale=40.0):
    """MAR brightening curve x' = 1 - (1-x)^(m*scale) (FDN_arch.py:282-284).

    Always computed in f32: pow(1-x, 40m) amplifies exponent quantization
    (bf16 eps on m shifts the exponent by 40*eps), so bf16 here destroys
    brightness accuracy (measured in the round-2 bf16 validation)."""
    xf = x.astype(jnp.float32)
    mf = m.astype(jnp.float32)
    out = 1.0 - jnp.power(jnp.maximum(1.0 - xf, 0.0), mf * scale)
    return out.astype(x.dtype)


def pad_to_multiple(x, multiple, mode="reflect"):
    """Reflect-pad H and W (bottom/right) up to the next multiple.

    Parity: F.pad(x, (0, pw, 0, ph), 'reflect') as used for eval
    (image_restoration_model.py:581-583, inference_fdn_lolblur.py:60-62).
    Returns (padded, (orig_h, orig_w)).
    """
    b, h, w, c = x.shape
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode=mode)
    return x, (h, w)


def unpad(x, hw):
    h, w = hw
    return x[:, :h, :w, :]


def leaky_relu(x, negative_slope=0.1):
    """torch.nn.LeakyReLU(0.1) — the reference's conv activation."""
    return jax.nn.leaky_relu(x, negative_slope)


def gelu(x):
    """Exact (erf) GELU — torch F.gelu default, NOT the tanh approximation."""
    return jax.nn.gelu(x, approximate=False)
