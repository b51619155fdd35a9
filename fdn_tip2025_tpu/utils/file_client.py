"""File-backend abstraction.

Parity: reference basicsr/utils/file_client.py:4-185 — a facade over
disk / LMDB / memcached byte sources feeding the data pipeline. Disk is
the only backend the FDN datasets actually exercise (the YAMLs say lmdb
but the glob dataset ignores it — paired_image_dataset.py:61-80); lmdb
and memcached backends raise with guidance unless their client libraries
are present.
"""

import cv2
import numpy as np


class HardDiskBackend:
    def get(self, filepath):
        with open(filepath, "rb") as f:
            return f.read()


class LmdbBackend:
    def __init__(self, db_path, readonly=True, lock=False, readahead=False):
        try:
            import lmdb
        except ImportError as e:
            raise ImportError("lmdb is not installed in this image") from e
        self._env = lmdb.open(db_path, readonly=readonly, lock=lock,
                              readahead=readahead)

    def get(self, key):
        with self._env.begin(write=False) as txn:
            return txn.get(key.encode("ascii"))


class MemcachedBackend:
    def __init__(self, server_list_cfg, client_cfg):
        raise ImportError("memcached client not available in this image")


class PackBackend:
    """FDNPack single-file dataset backend — the dependency-free LMDB
    analog (data/pack.py). Keys are pack-relative paths."""

    def __init__(self, pack_path):
        from fdn_tip2025_tpu.data.pack import PackReader
        self._reader = PackReader(pack_path)

    def get(self, key):
        return self._reader.get(key)


class FileClient:
    _backends = {
        "disk": HardDiskBackend,
        "lmdb": LmdbBackend,
        "memcached": MemcachedBackend,
        "pack": PackBackend,
    }

    def __init__(self, backend="disk", **kwargs):
        if backend not in self._backends:
            raise ValueError(f"backend {backend} not in "
                             f"{list(self._backends)}")
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath, client_key=None):
        return self.client.get(filepath)


def imfrombytes(content, flag="color", float32=False):
    """Bytes -> BGR HWC image (reference img_util.imfrombytes)."""
    img_np = np.frombuffer(content, np.uint8)
    imread_flags = {"color": cv2.IMREAD_COLOR,
                    "grayscale": cv2.IMREAD_GRAYSCALE,
                    "unchanged": cv2.IMREAD_UNCHANGED}
    img = cv2.imdecode(img_np, imread_flags[flag])
    if float32:
        img = img.astype(np.float32) / 255.0
    return img
