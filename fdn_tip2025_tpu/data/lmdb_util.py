"""LMDB dataset builders.

Parity: reference basicsr/utils/lmdb_util.py (:9-208) and
scripts/data_preparation/create_lmdb.py (:24-127) — build an image LMDB
with the BasicSR layout:

  name.lmdb/
    data.mdb, lock.mdb
    meta_info.txt   # "<key>.png (<h>,<w>,<c>) <compress_level>" per line

Keys are image paths without extension; values are cv2-encoded PNG bytes.
NOTE: the reference's own PairedImageDataset ignores `io_backend: lmdb`
and globs folders (paired_image_dataset.py:61-80) — these builders exist
for inventory/interop completeness. The `lmdb` package is not installed
in this image, so everything import-gates and the tests skip cleanly.
"""

import os

import cv2
import numpy as np


def _require_lmdb():
    try:
        import lmdb
    except ImportError as e:  # pragma: no cover - env without lmdb
        raise ImportError(
            "the 'lmdb' package is required for LMDB builders") from e
    return lmdb


def make_lmdb_from_imgs(data_path, lmdb_path, img_path_list, keys,
                        batch=5000, compress_level=1, map_size=None):
    """Write images under `data_path` into `lmdb_path` (BasicSR layout)."""
    lmdb = _require_lmdb()
    if not lmdb_path.endswith(".lmdb"):
        raise ValueError("lmdb_path must end with '.lmdb'")
    if len(img_path_list) != len(keys):
        raise ValueError("img_path_list and keys must align")

    if map_size is None:
        img = cv2.imread(os.path.join(data_path, img_path_list[0]),
                         cv2.IMREAD_UNCHANGED)
        _, buf = cv2.imencode(
            ".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
        map_size = buf.nbytes * len(img_path_list) * 10

    env = lmdb.open(lmdb_path, map_size=map_size)
    txn = env.begin(write=True)
    lines = []
    for idx, (rel, key) in enumerate(zip(img_path_list, keys)):
        img = cv2.imread(os.path.join(data_path, rel), cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(os.path.join(data_path, rel))
        h, w = img.shape[:2]
        c = 1 if img.ndim == 2 else img.shape[2]
        _, buf = cv2.imencode(
            ".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
        txn.put(key.encode("ascii"), buf.tobytes())
        lines.append(f"{key}.png ({h},{w},{c}) {compress_level}")
        if (idx + 1) % batch == 0:
            txn.commit()
            txn = env.begin(write=True)
    txn.commit()
    env.close()
    with open(os.path.join(lmdb_path, "meta_info.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return lmdb_path


def create_lmdb_for_folder(folder, lmdb_path, suffix="png", **kwargs):
    """Recursively collect `*.suffix` under `folder` -> one LMDB
    (the create_lmdb.py per-dataset prep flow, generalized)."""
    img_list = []
    for root, _, files in os.walk(folder):
        for name in sorted(files):
            if name.lower().endswith("." + suffix):
                img_list.append(
                    os.path.relpath(os.path.join(root, name), folder))
    img_list.sort()
    keys = [os.path.splitext(p)[0] for p in img_list]
    return make_lmdb_from_imgs(folder, lmdb_path, img_list, keys, **kwargs)


def read_img_lmdb(env, key, size=None):
    """Read one image back (HWC BGR uint8) from an open lmdb env."""
    with env.begin(write=False) as txn:
        buf = txn.get(key.encode("ascii"))
    if buf is None:
        raise KeyError(key)
    img = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_UNCHANGED)
    return img
