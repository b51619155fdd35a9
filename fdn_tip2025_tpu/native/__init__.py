"""ctypes bindings for the native image pipeline (loader.cc).

The native path replaces the per-sample Python chain
imread -> padding_min_size -> paired_random_crop -> augment_pair
(data/paired_dataset.py) with ONE C call that decodes, reflect-pads,
crops, augments, and normalizes outside the GIL. Randomness stays in
Python (same rng, same draw order as the cv2 path — bit-identical
batches for PNG inputs; tests/test_native_loader.py).

Usage:
    from fdn_tip2025_tpu import native
    if native.available():
        lq, gt = native.load_pair(lq_path, gt_path, top, left, crop,
                                  do_h, do_v, do_r)
"""

import ctypes
import os

import numpy as np

from fdn_tip2025_tpu.native.build import build

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("FDN_NATIVE_LOADER") == "0":
        return None
    so = build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.fdn_last_error.restype = ctypes.c_char_p
    lib.fdn_image_dims.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.fdn_decode_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int]
    lib.fdn_load_pair.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.fdn_load_batch.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.fdn_image_dims_mem.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.fdn_load_pair_mem.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
        ctypes.c_size_t, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


def available():
    """True if the native library built and loaded on this host."""
    return _load() is not None


def _err(lib):
    return (lib.fdn_last_error() or b"?").decode()


def image_dims(path):
    """(h, w) from the file header — no full decode."""
    lib = _load()
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.fdn_image_dims(os.fsencode(path), ctypes.byref(h),
                          ctypes.byref(w)):
        raise IOError(f"{path}: {_err(lib)}")
    return h.value, w.value


def decode_image(path):
    """Full decode -> HWC RGB float32 [0, 1] (≙ utils.img_io.imread)."""
    lib = _load()
    h, w = image_dims(path)
    out = np.empty((h, w, 3), np.float32)
    if lib.fdn_decode_f32(os.fsencode(path),
                          out.ctypes.data_as(
                              ctypes.POINTER(ctypes.c_float)), h, w):
        raise IOError(f"{path}: {_err(lib)}")
    return out


def load_pair(lq_path, gt_path, top, left, crop, do_h, do_v, do_r):
    """Decode + reflect-pad + crop + augment one training pair.

    Returns (lq, gt), each (crop, crop, 3) f32 RGB in [0, 1].
    """
    lib = _load()
    lq = np.empty((crop, crop, 3), np.float32)
    gt = np.empty((crop, crop, 3), np.float32)
    rc = lib.fdn_load_pair(
        os.fsencode(lq_path), os.fsencode(gt_path), int(top), int(left),
        int(crop), int(do_h), int(do_v), int(do_r),
        lq.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        gt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc:
        raise IOError(f"{lq_path} / {gt_path}: {_err(lib)}")
    return lq, gt


def image_dims_mem(data):
    """(h, w) from encoded bytes — no full decode (FDNPack entries)."""
    lib = _load()
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.fdn_image_dims_mem(data, len(data), ctypes.byref(h),
                              ctypes.byref(w)):
        raise IOError(f"buffer: {_err(lib)}")
    return h.value, w.value


def load_pair_mem(lq_bytes, gt_bytes, top, left, crop, do_h, do_v, do_r):
    """load_pair from encoded bytes (FDNPack path) — same contract."""
    lib = _load()
    lq = np.empty((crop, crop, 3), np.float32)
    gt = np.empty((crop, crop, 3), np.float32)
    rc = lib.fdn_load_pair_mem(
        lq_bytes, len(lq_bytes), gt_bytes, len(gt_bytes), int(top),
        int(left), int(crop), int(do_h), int(do_v), int(do_r),
        lq.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        gt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc:
        raise IOError(f"pack entry: {_err(lib)}")
    return lq, gt


def load_batch(lq_paths, gt_paths, tops, lefts, crop, hs, vs, rs,
               num_threads=0):
    """Threaded batch assembly -> (lq, gt) as (B, crop, crop, 3) f32."""
    lib = _load()
    b = len(lq_paths)
    enc_lq = [os.fsencode(p) for p in lq_paths]
    enc_gt = [os.fsencode(p) for p in gt_paths]
    lq_arr = (ctypes.c_char_p * b)(*enc_lq)
    gt_arr = (ctypes.c_char_p * b)(*enc_gt)

    def ints(v):
        return (ctypes.c_int * b)(*[int(x) for x in v])

    lq = np.empty((b, crop, crop, 3), np.float32)
    gt = np.empty((b, crop, crop, 3), np.float32)
    rc = lib.fdn_load_batch(
        b, lq_arr, gt_arr, ints(tops), ints(lefts), int(crop), ints(hs),
        ints(vs), ints(rs),
        lq.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        gt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(num_threads))
    if rc:
        raise IOError(
            f"batch sample {rc - 1} ({lq_paths[rc - 1]}): {_err(lib)}")
    return lq, gt
