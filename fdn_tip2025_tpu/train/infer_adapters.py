"""Validation-time predict functions per model family.

The reference's validation forwards differ per model wrapper
(image_restoration_model.py test() :564-711, _ipretrain :1161-1168,
_ipred :1949-1957): this module builds an image->image (or image->scalar)
closure over the live trainer params, with the pad-to-x32 protocol and
optional val.grids overlapped tiling (:261-339, :737-743).
"""

import numpy as np

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.models import (
    fdn_forward, fdn_lolv1_forward, mar_forward,
)
from fdn_tip2025_tpu.models.ipredict import ipredict_forward
from fdn_tip2025_tpu.ops import pad_to_multiple, unpad, grayscale


def grid_sizes(val_opt, h, w):
    """Tile size from config: crop_size_h/w or crop_size_h/w_ratio
    (image_restoration_model.py:263-273)."""
    if "crop_size_h" in val_opt:
        crop_h = int(val_opt["crop_size_h"])
    else:
        crop_h = int(float(val_opt["crop_size_h_ratio"]) * h)
    if "crop_size_w" in val_opt:
        crop_w = int(val_opt["crop_size_w"])
    else:
        crop_w = int(float(val_opt["crop_size_w_ratio"]) * w)
    return min(crop_h, h), min(crop_w, w)


def make_predict_fn(model_type, trainer, val_opt=None, fdn_params=None):
    """Build the per-family validation forward.

    val_opt: the config's val section — consumes grids/crop_size_h/w
    (_ratio)/max_minibatch for tiled validation.
    fdn_params: frozen full-FDN params for the LPNet (_ipred) protocol —
    the reference's model_fft (image_restoration_model.py:1488-1499),
    loaded from config instead of a hardcoded path.
    """
    params = trainer.params
    use_ratio = trainer.use_ratio
    val_opt = val_opt or {}
    use_grids = bool(val_opt.get("grids"))

    cache = {}

    def jit_for(shape, fn):
        if (shape, fn.__name__) not in cache:
            cache[(shape, fn.__name__)] = jax.jit(fn)
        return cache[(shape, fn.__name__)]

    if model_type == "ImageRestorationModel":
        variant = getattr(trainer, "variant", "fdn")
        fwd = fdn_forward if variant == "fdn" else fdn_lolv1_forward

        def f(p, x, r):
            return fwd(p, x, r)[0]

        def full_ratio(x, gt):
            # reference validation ratio protocol: mean(gray lq) /
            # mean(gray gt) (image_restoration_model.py:649-658), computed
            # on the UNpadded full images (feed_data_ir runs before both
            # the reflect pad and grids). Falls back to mean(gray lq)
            # when no GT exists (SingleImageDataset inference path).
            ratio = jnp.mean(grayscale(x), axis=(1, 2, 3))[:, None]
            if use_ratio and gt is not None:
                g = jnp.asarray(gt, jnp.float32)[None]
                ratio = ratio / jnp.mean(grayscale(g), axis=(1, 2, 3))[:, None]
            return ratio

        def predict(lq, gt=None):
            x = jnp.asarray(lq, jnp.float32)[None]
            ratio = full_ratio(x, gt)
            if not use_grids:
                x, hw = pad_to_multiple(x, 32)
                out = jit_for(x.shape, f)(params, x, ratio)
                return np.asarray(unpad(out, hw))[0]

            # val.grids tiled validation (grids/grids_inverse,
            # image_restoration_model.py:261-339): overlapped tiles
            # restored with the FULL-image ratio, count-avg stitched.
            from fdn_tip2025_tpu.parallel.spatial import tiled_restore
            lq_np = np.asarray(lq, np.float32)
            crop_h, crop_w = grid_sizes(val_opt, *lq_np.shape[:2])

            def tile_fwd(tiles):
                t, hw = pad_to_multiple(tiles, 32)
                r = jnp.broadcast_to(ratio, (t.shape[0], 1))
                out = jit_for(t.shape, f)(params, t, r)
                return unpad(out, hw)

            return tiled_restore(tile_fwd, lq_np, crop_h, crop_w,
                                 batch_size=val_opt.get("max_minibatch"))

        mesh = getattr(trainer, "mesh", None)
        n_dev = mesh.devices.size if mesh is not None else 1

        def predict_batch(lqs, gts=None):
            """Batched validation forward (the dist_validation analog,
            image_restoration_model.py:728-731): same-shape images stack
            into one program, sharded over the trainer's mesh. Used by
            validate(batch_size=...) via predict.batch."""
            x = jnp.asarray(lqs, jnp.float32)
            g = None if gts is None else jnp.asarray(gts, jnp.float32)
            b = x.shape[0]
            ratio = jnp.mean(grayscale(x), axis=(1, 2, 3))[:, None]
            if use_ratio and g is not None:
                ratio = ratio / jnp.mean(grayscale(g),
                                         axis=(1, 2, 3))[:, None]
            pad_n = (-b) % n_dev  # even shard per device
            if pad_n:
                x = jnp.concatenate(
                    [x, jnp.repeat(x[-1:], pad_n, axis=0)])
                ratio = jnp.concatenate(
                    [ratio, jnp.repeat(ratio[-1:], pad_n, axis=0)])
            x, hw = pad_to_multiple(x, 32)

            def f_batch(p, x, r):
                return fwd(p, x, r)[0]

            ck = (x.shape, "f_batch")
            if ck not in cache:
                jit_kw = {}
                if mesh is not None and n_dev > 1:
                    from fdn_tip2025_tpu.parallel.mesh import (
                        batch_sharding, replicated,
                    )
                    jit_kw = dict(
                        in_shardings=(replicated(mesh),
                                      batch_sharding(mesh),
                                      batch_sharding(mesh)),
                        out_shardings=batch_sharding(mesh))
                cache[ck] = jax.jit(f_batch, **jit_kw)
            out = cache[ck](params, x, ratio)
            return np.asarray(unpad(out, hw))[:b]

        predict.batch = None if use_grids else predict_batch
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
        if fdn_params is None:
            raise ValueError(
                "LPNet image validation needs frozen FDN weights "
                "(config path.pretrain_network_fft) — the reference "
                "validates _ipred by restoring through a frozen full FDN "
                "with ratio = mean(gray lq)/pred "
                "(image_restoration_model.py:1488-1499,1949-1957). "
                "Without them, validate ratio error via "
                "lpnet_ratio_validation instead.")

        def predict(lq, gt=None):
            x = jnp.asarray(lq, jnp.float32)[None]

            def fp(lp, fp_, x):
                pred = ipredict_forward(lp, x)
                gray = jnp.mean(grayscale(x), axis=(1, 2, 3))[:, None]
                return pred, gray / pred

            pred, ratio = jit_for(x.shape, fp)(params, fdn_params, x)
            xp, hw = pad_to_multiple(x, 32)

            def f(p, x, r):
                return fdn_forward(p, x, r)[0]

            out = jit_for(xp.shape, f)(fdn_params, xp, ratio)
            return np.asarray(unpad(out, hw))[0]

        return predict

    raise KeyError(model_type)


def lpnet_ratio_validation(trainer, dataset, max_images=None):
    """LPNet validation without a frozen FDN: mean |pred - mean(gray gt)|
    over the val set (the quantity the _ipred training loss targets,
    image_restoration_model.py:1793-1799)."""
    params = trainer.params
    cache = {}
    total, n = 0.0, 0
    for idx in range(len(dataset)):
        if max_images is not None and idx >= max_images:
            break
        sample = dataset[idx]
        x = jnp.asarray(sample["lq"], jnp.float32)[None]
        if x.shape not in cache:
            cache[x.shape] = jax.jit(ipredict_forward)
        pred = float(np.asarray(cache[x.shape](params, x))[0, 0])
        target = float(np.mean(np.asarray(
            grayscale(jnp.asarray(sample["gt"], jnp.float32)[None]))))
        total += abs(pred - target)
        n += 1
    return {"ratio_l1": total / max(n, 1)}
