"""High-level inference API: the TPU-native equivalent of the reference's
inference_fdn_{lolblur,lolv1,multi_r}.py scripts (repo root).

Design notes (TPU-first):
  * jit per padded shape with an explicit cache — variable test resolutions
    are bucketed by pad-to-x32 shape so XLA compiles one program per bucket
    (LOL-Blur is a single 1120x640 bucket).
  * batching: multiple same-shape images can be stacked for throughput.
  * ratio semantics preserved exactly per config (SURVEY.md §7 quirks):
    lolblur passes the LPNet sigmoid output directly
    (inference_fdn_lolblur.py:65-71); lolv1 passes mean(gray)/pred
    (inference_fdn_lolv1.py:58-64).
"""


import os
import threading

import numpy as np

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.models import (
    init_fdn, fdn_forward, init_fdn_lolv1, fdn_lolv1_forward,
    init_ipredict, ipredict_forward,
)
from fdn_tip2025_tpu.checkpoint import load_model_from_pth
from fdn_tip2025_tpu.checkpoint.manager import load_network
from fdn_tip2025_tpu.ops import grayscale
from fdn_tip2025_tpu.parallel.mesh import (
    batch_sharding, replicated, replicate_tree, spatial_sharding,
)


def _load_params(path, template):
    if path is None:
        return template
    if path.endswith(".pth"):
        return load_model_from_pth(path, template)
    return load_network(path)


class FDNPredictor:
    """End-to-end FDN inference: LPNet ratio -> FDN restore."""

    spatial = False  # class default: tests/export build via __new__

    def __init__(self, variant="lolblur", fdn_ckpt=None, lpnet_ckpt=None,
                 key=None, dtype=jnp.float32, mesh=None, spatial=False):
        """dtype: serving dtype. float32 is the parity mode. bfloat16
        serves MAR+FDformer in bf16 while LPNet (the trained ratio head:
        bf16 shifts its ratio ~1%, which the gamma exponent amplifies
        40x), the gamma pow, and LayerNorm statistics stay f32.

        bf16 accuracy is VALIDATED with trained weights: 43.5 dB PSNR /
        SSIM 1.00 vs f32 at 1120x640 (tools/cross_check.py --bf16-size
        640, benchmarks/artifacts/cross_check_r2.json). Random-weight
        models remain chaotic (f32-TPU vs f32-CPU ~9 dB; the torch
        reference itself diverges ~1.1 max-abs under 1e-6 input
        perturbation) — never validate modes with random weights.

        mesh: optional jax.sharding.Mesh for data-parallel serving —
        params are replicated, the batch dim is sharded over the mesh's
        first axis, and batches are zero-padded up to a multiple of the
        mesh size (padded outputs dropped). Per-image work is fully
        independent, so DP serving scales linearly over ICI (the
        multi-GPU analog the reference gets from dist_test.sh's
        per-rank image sharding, image_restoration_model.py:728-731).

        spatial (requires mesh): shard each image's H (row) dimension
        over the mesh instead of the batch dim — the sequence-parallel
        analog (SURVEY.md §2.8). GSPMD inserts halo exchanges for the
        convs/patch ops and collectives for the full-image DFT matmuls,
        so ONE image's forward spreads across chips: this is the
        per-request LATENCY lever (DP `mesh` alone only adds
        throughput). Images pad to x(32*lcm-with-mesh) rows so shards
        stay even."""
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        self.variant = variant
        self.dtype = dtype
        if variant == "lolblur":
            self.fdn_params = _load_params(fdn_ckpt, init_fdn(k1))
            self._fdn_fwd = fdn_forward
        elif variant == "lolv1":
            self.fdn_params = _load_params(fdn_ckpt, init_fdn_lolv1(k1))
            self._fdn_fwd = fdn_lolv1_forward
        else:
            raise ValueError(variant)
        self.lpnet_params = _load_params(lpnet_ckpt, init_ipredict(k2))
        if dtype != jnp.float32:
            self.fdn_params = jax.tree.map(
                lambda a: a.astype(dtype)
                if a.dtype == jnp.float32 else a, self.fdn_params)
        self.mesh = mesh
        if spatial and mesh is None:
            raise ValueError("spatial=True requires a mesh")
        self.spatial = bool(spatial)
        if mesh is not None:
            self.fdn_params = replicate_tree(self.fdn_params, mesh)
            self.lpnet_params = replicate_tree(self.lpnet_params, mesh)
        self._jit_cache = {}

    def _traced_fwd(self, fdn_p, x, ratio):
        """self._fdn_fwd with the serving-only scan unroll scoped to THIS
        trace: FDN_SCAN_UNROLL is read at trace time inside _run_blocks
        (models/fdformer.py:96); unroll=5 is +3.5% for bf16 serving but
        must not leak into later f32/train jits in the same process
        (training keeps unroll 1 — compile-time/remat interplay, see the
        round-3 scan-unroll sweep in OPTIMIZATIONS.md). An explicit
        FDN_SCAN_UNROLL in the environment still wins."""
        if self.dtype != jnp.bfloat16 or "FDN_SCAN_UNROLL" in os.environ:
            return self._fdn_fwd(fdn_p, x, ratio)
        os.environ["FDN_SCAN_UNROLL"] = "5"
        try:
            return self._fdn_fwd(fdn_p, x, ratio)
        finally:
            os.environ.pop("FDN_SCAN_UNROLL", None)

    def _compiled(self, shape, with_ratio, from_uint8, to_uint8):
        key = (shape, with_ratio, from_uint8, to_uint8)
        # lazy + atomic under the GIL (tests build predictors via __new__)
        lock = self.__dict__.setdefault("_cache_lock", threading.Lock())
        with lock:  # concurrent serving dispatch threads
            return self._compiled_locked(key, with_ratio,
                                         from_uint8, to_uint8)

    def _compiled_locked(self, key, with_ratio, from_uint8, to_uint8):
        if key not in self._jit_cache:
            jit_kw = {}
            if self.mesh is not None:
                rep = replicated(self.mesh)
                if self.spatial:
                    # one image split row-wise across the mesh; the
                    # (B, 1) ratio stays replicated
                    ssh = spatial_sharding(self.mesh)
                    jit_kw = dict(
                        in_shardings=(rep, ssh, rep) if with_ratio
                        else (rep, rep, ssh),
                        out_shardings=ssh)
                else:
                    bsh = batch_sharding(self.mesh)
                    jit_kw = dict(
                        in_shardings=(rep, bsh, bsh) if with_ratio
                        else (rep, rep, bsh),
                        out_shardings=bsh)
            fn = self._build_fn(with_ratio, from_uint8, to_uint8)
            self._jit_cache[key] = jax.jit(fn, **jit_kw)
        return self._jit_cache[key]

    def _build_fn(self, with_ratio, from_uint8, to_uint8):
        """The (unjitted) serving program for one wire configuration:
        (fdn_p, x, ratio) when with_ratio else (fdn_p, lp_p, x). Shared by
        the jit cache above and by AOT export (fdn_tip2025_tpu.export)."""

        def pre(x):
            # uint8 wire format: normalize on-device in f32, so the
            # tunnel/PCIe ships 1 byte/px instead of 4. Matches the
            # host f32 divide to <=1 ULP (XLA lowers x/255 to
            # x*(1/255)) — far below the 1/255 quantization the
            # uint8 wire carries by construction
            if from_uint8:
                x = x.astype(jnp.float32) / 255.0
            return x.astype(self.dtype)

        def post(out):
            # uint8 egress matches tensor2img exactly (clip 0..1,
            # *255, round-half-even — img_util.py:41-118); the
            # reference's own eval protocol quantizes to uint8 at
            # imwrite time, so this is lossless w.r.t. saved PNGs
            if to_uint8:
                of = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
                return jnp.round(of * 255.0).astype(jnp.uint8)
            return out

        if with_ratio:
            def fn(fdn_p, x, ratio):
                return post(self._traced_fwd(fdn_p, pre(x), ratio)[0])

            return fn

        def fn(fdn_p, lp_p, x):
            # LPNet always runs f32 (trained head; bf16 shifts
            # the ratio ~1% which the gamma exponent amplifies)
            x = pre(x)
            xf = x.astype(jnp.float32)
            pred = ipredict_forward(lp_p, xf)
            if self.variant == "lolv1":
                gray = jnp.mean(grayscale(xf), axis=(1, 2, 3),
                                keepdims=False)[:, None]
                ratio = gray / pred
            else:
                ratio = pred
            return post(self._traced_fwd(fdn_p, x,
                                         ratio.astype(x.dtype))[0])

        return fn

    def _pad_hw(self, h, w):
        """Reflect-pad target: pad-to-x32 (the reference's test protocol,
        image_restoration_model.py:581-583). Exported AOT predictors
        override this to pad up to their fixed compiled buckets.
        Spatial-sharded predictors additionally pad H so every mesh
        shard gets the same whole number of rows."""
        mod_h = 32
        if self.spatial:
            import math
            mod_h = math.lcm(32, self.mesh.devices.size)
        return (-h) % mod_h, (-w) % 32

    def restore(self, img, ratio=None, output="float32"):
        """img: (H,W,3) or (B,H,W,3) RGB — float32 in [0,1] or uint8
        (the wire-efficient path: 1 byte/px H2D, normalized on-device;
        trained-weights validated vs the f32 wire at 58.4 dB f32 /
        43.2 dB bf16 = the modes' own noise floors —
        benchmarks/artifacts/cross_check_u8_r2.json). Returns same-shape
        restored image(s), computed at pad-to-x32 resolution then cropped
        (image_restoration_model.py:581-583 protocol).

        output: 'float32' (default) or 'uint8' — on-device tensor2img
        quantization (clip/round, bit-identical to saving a PNG from the
        float output), 1 byte/px D2H. Host<->device transfer is the
        serving bottleneck behind a thin pipe, so uint8-in/uint8-out cuts
        wire bytes 4x each way vs f32."""
        if output not in ("float32", "uint8"):
            raise ValueError(output)
        squeeze = img.ndim == 3
        if squeeze:
            img = img[None]
        img = np.asarray(img)
        from_uint8 = img.dtype == np.uint8
        n_real, h, w = img.shape[:3]
        if self.mesh is not None and not self.spatial:
            # batch zero-padded to a mesh multiple so the shard is even
            n_dev = self.mesh.devices.size
            pad_n = (-n_real) % n_dev
            if pad_n:
                img = np.concatenate(
                    [img, np.zeros((pad_n,) + img.shape[1:],
                                   img.dtype)], axis=0)
        # x32 reflect pad on the HOST (numpy) — avoids an eager device
        # dispatch per request; semantics identical to ops.pad_to_multiple
        ph, pw = self._pad_hw(h, w)
        if ph or pw:
            img = np.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)),
                         mode="reflect")
        if not from_uint8 and self.dtype == jnp.bfloat16:
            # cast to bf16 on the HOST so the H2D transfer ships half
            # the bytes (the tunnel/PCIe pipe is the serving bottleneck;
            # see OPTIMIZATIONS.md round-4 serving-latency entry);
            # ml_dtypes is the numpy bf16 jax itself uses
            import ml_dtypes
            img = img.astype(ml_dtypes.bfloat16)
        x = jnp.asarray(img)  # uint8 ships as-is; normalized on device
        to_uint8 = output == "uint8"
        if ratio is None:
            fn = self._compiled(x.shape, False, from_uint8, to_uint8)
            out = fn(self.fdn_params, self.lpnet_params, x)
        else:
            ratio = np.asarray(ratio, np.float32).reshape(-1, 1)
            if ratio.shape[0] == 1 and n_real > 1:
                # scalar ratio applies to every image in the batch (the
                # reference broadcasts a (1,1) ratio in MAR, z2 * ratio)
                ratio = np.broadcast_to(ratio, (n_real, 1))
            if ratio.shape[0] != n_real:
                raise ValueError(
                    f"ratio batch {ratio.shape[0]} != image batch {n_real}")
            if ratio.shape[0] != x.shape[0]:  # batch was mesh-padded
                ratio = np.concatenate(
                    [ratio, np.full((x.shape[0] - ratio.shape[0], 1), 0.5,
                                    np.float32)], axis=0)
            ratio = jnp.asarray(ratio, self.dtype)
            fn = self._compiled(x.shape, True, from_uint8, to_uint8)
            out = fn(self.fdn_params, x, ratio)
        # D2H in the wire dtype (uint8/bf16 halve or quarter the bytes),
        # crop + f32 cast on the host
        out = np.asarray(out)[:n_real, :h, :w]
        if not to_uint8:
            out = out.astype(np.float32)
        return out[0] if squeeze else out

    def restore_tiled(self, img, crop=384, ratio=None, batch_size=None,
                      output="float32"):
        """Beyond-bucket restore: the reference's grids/grids_inverse
        overlapped crop-and-stitch protocol
        (image_restoration_model.py:261-339) as a predictor method —
        tiles ride one static-shape jit (cached per (crop, batch)), ship
        uint8 when `img` is uint8, and shard over self.mesh if set.

        ratio: global brightness ratio; default = LPNet on a <=1024px
        bilinear thumbnail (the ratio is global, not per tile)."""
        from fdn_tip2025_tpu.parallel.spatial import tiled_restore
        from fdn_tip2025_tpu.ops import interp_bilinear

        if output not in ("float32", "uint8"):
            raise ValueError(output)
        if crop % 32:
            raise ValueError("crop must be a multiple of 32")
        img = np.asarray(img)
        from_uint8 = img.dtype == np.uint8
        h, w = img.shape[:2]
        if h < crop or w < crop:  # smaller than a tile: plain restore
            return self.restore(img, ratio=ratio, output=output)
        if ratio is None:
            thumb = (img.astype(np.float32) / 255.0 if from_uint8
                     else img)
            full = thumb
            while max(thumb.shape[:2]) > 1024:
                thumb = np.asarray(interp_bilinear(
                    jnp.asarray(thumb)[None], 0.5))[0]
            ratio = float(self.predict_ratio(thumb)[0, 0])
            if self.variant == "lolv1":
                # lolv1 ratio protocol: mean(gray(img))/pred
                # (inference_fdn_lolv1.py:58-64) — gray mean over the
                # FULL image (host numpy; only LPNet sees the thumbnail)
                from fdn_tip2025_tpu.ops.image import _GRAY_W
                gray = float(np.mean(
                    np.asarray(full, np.float32)
                    @ np.asarray(_GRAY_W, np.float32)))
                ratio = gray / ratio
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        bs = batch_size or max(4, n_dev)

        key = ("tiled", crop, bs, from_uint8)
        lock = self.__dict__.setdefault("_cache_lock", threading.Lock())
        with lock:
            if key not in self._jit_cache:
                jit_kw = {}
                if self.mesh is not None:
                    rep = replicated(self.mesh)
                    bsh = batch_sharding(self.mesh)
                    jit_kw = dict(in_shardings=(rep, bsh, rep),
                                  out_shardings=bsh)

                def fn(fdn_p, tiles, rj):
                    x = tiles
                    if from_uint8:
                        x = x.astype(jnp.float32) / 255.0
                    x = x.astype(self.dtype)
                    rb = jnp.broadcast_to(rj, (x.shape[0], 1))
                    out = self._traced_fwd(fdn_p, x, rb.astype(x.dtype))[0]
                    # stitch (count averaging) runs on the host in f32;
                    # D2H stays in the serving dtype
                    return out

                self._jit_cache[key] = jax.jit(fn, **jit_kw)
        fn = self._jit_cache[key]
        rj = jnp.asarray([[np.float32(ratio)]], self.dtype)

        out = tiled_restore(
            lambda tiles: np.asarray(
                fn(self.fdn_params, tiles, rj)).astype(np.float32),
            img, crop, crop, batch_size=bs, mesh=self.mesh)
        if output == "uint8":
            return np.round(np.clip(out, 0.0, 1.0) * 255.0).astype(
                np.uint8)
        return out.astype(np.float32)

    def predict_ratio(self, img):
        if img.ndim == 3:
            img = img[None]
        img = np.asarray(img)
        if img.dtype == np.uint8:  # uint8 wire callers
            img = img.astype(np.float32) / 255.0
        x = jnp.asarray(img, jnp.float32)  # LPNet always serves in f32
        return np.asarray(ipredict_forward(self.lpnet_params, x))
