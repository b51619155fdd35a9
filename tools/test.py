#!/usr/bin/env python
"""Offline evaluation over val/test dataset phases — equivalent of the
reference's basicsr/test.py (+ scripts/dist_test.sh):
  python tools/test.py -opt configs/fdn_lolblur.yml --ckpt <net_g_...>
Evaluates every dataset phase whose name starts with 'val' or 'test'.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-opt", required=True)
    ap.add_argument("--ckpt", default=None,
                    help="native checkpoint dir or torch .pth")
    ap.add_argument("--lpnet-ckpt", default=None,
                    help="LPNet weights: use the predicted-ratio inference "
                         "protocol instead of the default GT-ratio test "
                         "protocol (image_restoration_model.py:649-658)")
    ap.add_argument("--save-img", action="store_true")
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard eval batches over the first N devices — "
                         "the dist_test.sh multi-GPU analog (per-rank "
                         "image sharding, "
                         "image_restoration_model.py:728-731)")
    ap.add_argument("--batch", type=int, default=0,
                    help="stack this many same-shape images per forward "
                         "(default: mesh size, or 1)")
    args = ap.parse_args()

    import jax

    from fdn_tip2025_tpu.utils.options import parse
    from fdn_tip2025_tpu.utils.logger import get_root_logger
    from fdn_tip2025_tpu.data.paired_dataset import PairedImageDataset
    from fdn_tip2025_tpu.train.validation import validate
    from fdn_tip2025_tpu.inference import FDNPredictor, _load_params
    from fdn_tip2025_tpu.models import (
        init_mar, mar_forward, init_ipredict,
    )

    opt = parse(args.opt, is_train=False)
    logger = get_root_logger()
    model_type = opt["model_type"]

    if model_type == "ImageRestorationModel":
        import numpy as np
        import jax.numpy as jnp
        from fdn_tip2025_tpu.ops import grayscale

        variant = "lolv1" if opt.get("network_g", {}).get("type") == \
            "FDN_lolv1" else "lolblur"
        mesh = None
        if args.mesh:
            from fdn_tip2025_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(args.mesh)
        pred = FDNPredictor(variant=variant, fdn_ckpt=args.ckpt,
                            lpnet_ckpt=args.lpnet_ckpt, mesh=mesh)
        val_opt = opt.get("val", {}) or {}
        use_grids = bool(val_opt.get("grids"))

        def _restore(lq, ratio):
            """Full-image or val.grids tiled restore (ratio computed on
            the FULL image either way — grids runs after feed_data_ir in
            the reference, image_restoration_model.py:737-743)."""
            if not use_grids:
                return pred.restore(lq, ratio=ratio)
            from fdn_tip2025_tpu.parallel.spatial import tiled_restore
            from fdn_tip2025_tpu.train.infer_adapters import grid_sizes
            crop_h, crop_w = grid_sizes(val_opt, *lq.shape[:2])

            def tile_fwd(tiles):
                t = np.asarray(tiles)
                return pred.restore(
                    t, ratio=np.full((t.shape[0], 1), ratio, np.float32))

            return tiled_restore(tile_fwd, np.asarray(lq, np.float32),
                                 crop_h, crop_w,
                                 batch_size=val_opt.get("max_minibatch"))

        def _ratios(lqs, gts):
            """Per-image ratio vector, either protocol."""
            if args.lpnet_ckpt:
                # inference protocol: LPNet-predicted ratio
                # (inference_fdn_lolblur.py:65-71 / lolv1:58-64)
                r = pred.predict_ratio(lqs)[:, 0]
                if variant == "lolv1":
                    gray = np.mean(np.asarray(
                        grayscale(jnp.asarray(lqs, jnp.float32))),
                        axis=(1, 2, 3))
                    r = gray / r
                return r
            # reference test protocol: ratio = mean(gray lq)/mean(gray gt)
            # (image_restoration_model.py:649-658). Never evaluate with a
            # randomly-initialized LPNet.
            if gts is None:
                raise SystemExit(
                    "GT-ratio test protocol needs paired GT; pass "
                    "--lpnet-ckpt for the LPNet-ratio protocol")
            g = grayscale(jnp.asarray(lqs, jnp.float32))
            t = grayscale(jnp.asarray(gts, jnp.float32))
            return (np.mean(np.asarray(g), axis=(1, 2, 3))
                    / np.mean(np.asarray(t), axis=(1, 2, 3)))

        def predict(lq, gt=None):
            r = float(_ratios(
                np.asarray(lq)[None],
                None if gt is None else np.asarray(gt)[None])[0])
            return _restore(lq, r)

        def predict_batch(lqs, gts=None):
            # the dist_test.sh analog: one batched forward, sharded over
            # --mesh devices by FDNPredictor (batch zero-padded to a mesh
            # multiple; per-image work is independent)
            r = _ratios(lqs, gts)
            return pred.restore(lqs, ratio=np.asarray(r, np.float32))
        batch = args.batch or (args.mesh if args.mesh else 1)
        if use_grids:
            batch = 1  # grids route restores one image's tiles at a time
    elif model_type == "ImageRestorationModel_ipretrain":
        import numpy as np
        import jax.numpy as jnp
        from fdn_tip2025_tpu.ops import (
            pad_to_multiple, unpad, grayscale,
        )
        params = _load_params(args.ckpt, init_mar(jax.random.PRNGKey(0)))
        jfwd = jax.jit(lambda p, x, r: mar_forward(p, x, r)[2])

        def predict(lq, gt=None):
            x = jnp.asarray(lq, jnp.float32)[None]
            ratio = jnp.mean(grayscale(x), axis=(1, 2, 3))
            if gt is not None:
                g = jnp.asarray(gt, jnp.float32)[None]
                ratio = ratio / jnp.mean(grayscale(g), axis=(1, 2, 3))
            ratio = ratio[:, None, None, None]
            x, hw = pad_to_multiple(x, 32)
            return np.asarray(unpad(jfwd(params, x, ratio), hw))[0]

        predict_batch, batch = None, 1
    else:
        raise SystemExit(f"test.py does not support {model_type}")

    for phase, ds_opt in opt.get("datasets", {}).items():
        if not (phase.startswith("val") or phase.startswith("test")):
            continue
        ds = PairedImageDataset(ds_opt)
        save_dir = os.path.join(opt["path"]["visualization"], phase) \
            if args.save_img else None
        res = validate(predict, ds, opt.get("val", {}).get("metrics", {}),
                       save_dir=save_dir, max_images=args.max_images,
                       predict_batch_fn=predict_batch if batch > 1
                       else None, batch_size=batch)
        logger.info(f"{phase}: " + ", ".join(
            f"{k}: {v:.4f}" for k, v in res.items()))


if __name__ == "__main__":
    main()
