"""AOT serving artifacts via jax.export (StableHLO).

`save_exported` serializes the EXACT serving programs a live
`FDNPredictor` would jit (same `_build_fn`, same wire format) for a fixed
set of (batch, H, W) buckets, together with the weights, into one
self-contained `.fdnx` file. `load_exported` returns a predictor that
serves those buckets without re-tracing the model, without checkpoint
conversion, and without recompiling Python model code — the production
deployment story the reference lacks entirely (its answer is "clone the
repo, edit the hardcoded paths in inference_fdn_lolblur.py:20-34").

TPU-native rationale: jax.export captures the lowered StableHLO, so the
artifact pins the numerics of the validated serving mode (bf16 wire
choices and all) independent of future model-code edits; loading is
deserialize + XLA compile, nothing else.

Format (`.fdnx` = zip):
  meta.json        format version, variant, dtype, platforms, buckets
  fdn_params.npz   dotted-path flattened FDN weights
  lpnet_params.npz dotted-path flattened LPNet weights
  exp/<i>.bin      jax.export serialized program per bucket
"""

import io
import json
import zipfile

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport

from fdn_tip2025_tpu.inference import FDNPredictor
from fdn_tip2025_tpu.utils.pytree import flatten, unflatten

_FORMAT = "fdnx-1"


def _save_npz(zf, name, tree):
    buf = io.BytesIO()
    np.savez(buf, **{k: np.asarray(v) for k, v in flatten(tree).items()})
    zf.writestr(name, buf.getvalue())


def _load_npz(zf, name):
    with zf.open(name) as f:
        data = np.load(io.BytesIO(f.read()))
        return unflatten({k: data[k] for k in data.files})


def save_exported(path, predictor, buckets, with_ratio=False,
                  from_uint8=True, to_uint8=True, platforms=None):
    """Serialize `predictor`'s serving programs for the given buckets.

    buckets: iterable of (batch, height, width); height/width must be
      multiples of 32 (the padded shapes the programs are compiled for).
    with_ratio: also export the explicit-ratio variant per bucket.
    from_uint8/to_uint8: the wire format to bake in (uint8 is the
      validated production wire — benchmarks/artifacts/cross_check_u8_r2).
    platforms: e.g. ("tpu", "cpu") for a multi-platform artifact; None
      exports for the current default backend only. NOTE: trace-time
      backend dispatch (ops/conv.py CPU stencil, ops/precision.py) is
      resolved at export time, so a cross-platform artifact runs the
      exporting backend's lowering choices everywhere (numerically
      equivalent, possibly slower off-native).
    """
    if predictor.mesh is not None:
        raise ValueError("AOT export is single-device; build the "
                         "predictor without a mesh")
    in_dtype = jnp.uint8 if from_uint8 else predictor.dtype
    meta = {
        "format": _FORMAT,
        "variant": predictor.variant,
        "dtype": str(jnp.dtype(predictor.dtype)),
        "platforms": list(platforms) if platforms else None,
        "from_uint8": bool(from_uint8),
        "to_uint8": bool(to_uint8),
        "buckets": [],
    }
    kw = dict(platforms=tuple(platforms)) if platforms else {}
    blobs = []
    for batch, h, w in buckets:
        if h % 32 or w % 32:
            raise ValueError(f"bucket {h}x{w} not x32-aligned")
        x = jax.ShapeDtypeStruct((batch, h, w, 3), in_dtype)
        variants = [False, True] if with_ratio else [False]
        for wr in variants:
            fn = predictor._build_fn(wr, from_uint8, to_uint8)
            if wr:
                ratio = jax.ShapeDtypeStruct((batch, 1), predictor.dtype)
                exp = jexport.export(jax.jit(fn), **kw)(
                    predictor.fdn_params, x, ratio)
            else:
                exp = jexport.export(jax.jit(fn), **kw)(
                    predictor.fdn_params, predictor.lpnet_params, x)
            meta["buckets"].append(
                {"batch": batch, "h": h, "w": w, "with_ratio": wr,
                 "blob": len(blobs)})
            blobs.append(exp.serialize())
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=1))
        _save_npz(zf, "fdn_params.npz", predictor.fdn_params)
        _save_npz(zf, "lpnet_params.npz", predictor.lpnet_params)
        for i, blob in enumerate(blobs):
            zf.writestr(f"exp/{i}.bin", blob)
    return meta


class ExportedFDN(FDNPredictor):
    """Serve from a .fdnx artifact: fixed buckets, no model re-trace.

    Reuses FDNPredictor's host-side restore() protocol (x32/bucket pad,
    uint8 wire, crop-back) with `_compiled` answering from the exported
    programs instead of a jit cache. Images pad up to the smallest
    covering bucket; shapes beyond every bucket raise."""

    def __init__(self, path):
        with zipfile.ZipFile(path) as zf:
            meta = json.loads(zf.read("meta.json"))
            if meta.get("format") != _FORMAT:
                raise ValueError(f"not a {_FORMAT} artifact: {path}")
            self.meta = meta
            self.variant = meta["variant"]
            self.dtype = jnp.dtype(meta["dtype"])
            self.mesh = None
            self._from_uint8 = bool(meta["from_uint8"])
            self._to_uint8 = bool(meta["to_uint8"])
            self.fdn_params = _load_npz(zf, "fdn_params.npz")
            self.lpnet_params = _load_npz(zf, "lpnet_params.npz")
            self._exp = {}
            for b in meta["buckets"]:
                blob = zf.read(f"exp/{b['blob']}.bin")
                self._exp[(b["batch"], b["h"], b["w"],
                           b["with_ratio"])] = jexport.deserialize(blob)

    def buckets(self):
        return sorted(self._exp)

    def _pad_hw(self, h, w):
        """Pad to the smallest exported bucket that covers (h, w)."""
        fits = [(bh, bw) for (_, bh, bw, _) in self._exp
                if bh >= h and bw >= w]
        if not fits:
            raise ValueError(
                f"image {h}x{w} exceeds every exported bucket "
                f"{sorted(set((b, c) for _, b, c, _ in self._exp))}")
        bh, bw = min(fits, key=lambda s: s[0] * s[1])
        return bh - h, bw - w

    def _compiled(self, shape, with_ratio, from_uint8, to_uint8):
        if from_uint8 != self._from_uint8 or to_uint8 != self._to_uint8:
            raise ValueError(
                f"artifact was exported for uint8_in={self._from_uint8} "
                f"uint8_out={self._to_uint8}; got a "
                f"{'uint8' if from_uint8 else 'float'} request with "
                f"output={'uint8' if to_uint8 else 'float32'}")
        key = (shape[0], shape[1], shape[2], with_ratio)
        if key not in self._exp:
            raise ValueError(
                f"no exported program for batch={shape[0]} "
                f"{shape[1]}x{shape[2]} with_ratio={with_ratio}; "
                f"available: {self.buckets()}")
        return self._exp[key].call

    def restore(self, img, ratio=None, output=None):
        if output is None:
            output = "uint8" if self._to_uint8 else "float32"
        return super().restore(img, ratio=ratio, output=output)

    def predict_ratio(self, img):
        raise NotImplementedError(
            "the exported artifact embeds LPNet inside the restore "
            "program; export with with_ratio=True to drive explicit "
            "ratios instead")


def load_exported(path):
    return ExportedFDN(path)
