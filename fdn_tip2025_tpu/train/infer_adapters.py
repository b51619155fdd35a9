"""Validation-time predict functions per model family.

The reference's validation forwards differ per model wrapper
(image_restoration_model.py test() :564-711, _ipretrain :1161-1168,
_ipred :1949-1957): this module builds an image->image (or image->scalar)
closure over the live trainer params, with the pad-to-x32 protocol.
"""

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.models import (
    fdn_forward, fdn_lolv1_forward, mar_forward,
)
from fdn_tip2025_tpu.models.ipredict import ipredict_forward
from fdn_tip2025_tpu.ops import pad_to_multiple, unpad, grayscale
from fdn_tip2025_tpu.train.engine import compute_ratio


def make_predict_fn(model_type, trainer):
    params = trainer.params
    use_ratio = trainer.use_ratio

    cache = {}

    def jit_for(shape, fn):
        if (shape, fn.__name__) not in cache:
            cache[(shape, fn.__name__)] = jax.jit(fn)
        return cache[(shape, fn.__name__)]

    if model_type == "ImageRestorationModel":
        variant = getattr(trainer, "variant", "fdn")
        fwd = fdn_forward if variant == "fdn" else fdn_lolv1_forward

        def predict(lq, gt=None):
            x = jnp.asarray(lq, jnp.float32)[None]
            # reference validation ratio protocol: mean(gray lq) /
            # mean(gray gt) (image_restoration_model.py:649-658), computed
            # on the UNpadded images (feed_data_ir runs before test()'s
            # reflect pad). Falls back to mean(gray lq) when no GT exists
            # (SingleImageDataset inference path).
            ratio = jnp.mean(grayscale(x), axis=(1, 2, 3))[:, None]
            if use_ratio and gt is not None:
                g = jnp.asarray(gt, jnp.float32)[None]
                ratio = ratio / jnp.mean(grayscale(g), axis=(1, 2, 3))[:, None]
            x, hw = pad_to_multiple(x, 32)

            def f(p, x, r):
                return fwd(p, x, r)[0]

            out = jit_for(x.shape, f)(params, x, ratio)
            return np.asarray(unpad(out, hw))[0]

        return predict

    if model_type == "ImageRestorationModel_ipretrain":
        def predict(lq, gt=None):
            x = jnp.asarray(lq, jnp.float32)[None]
            ratio = jnp.mean(grayscale(x), axis=(1, 2, 3))
            if use_ratio and gt is not None:
                g = jnp.asarray(gt, jnp.float32)[None]
                ratio = ratio / jnp.mean(grayscale(g), axis=(1, 2, 3))
            ratio = ratio[:, None, None, None]
            x, hw = pad_to_multiple(x, 32)

            def f(p, x, r):
                return mar_forward(p, x, r)[2]

            out = jit_for(x.shape, f)(params, x, ratio)
            return np.asarray(unpad(out, hw))[0]

        return predict

    if model_type == "ImageRestorationModel_ipred":
        def predict(lq, gt=None):
            x = jnp.asarray(lq, jnp.float32)[None]

            def f(p, x):
                return ipredict_forward(p, x)

            pred = jit_for(x.shape, f)(params, x)
            # broadcast the scalar ratio into an image so the generic
            # metric loop can consume it; LPNet validation quality is
            # tracked as |pred - mean(gray gt)| via the l_pix log instead.
            return np.full_like(np.asarray(lq),
                                float(np.asarray(pred)[0, 0]))

        return predict

    raise KeyError(model_type)
