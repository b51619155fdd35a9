"""FDNPack — single-file packed image dataset (the LMDB analog).

Parity target: the reference ships LMDB dataset builders and an LMDB
file backend (basicsr/utils/lmdb_util.py:9-208, create_lmdb.py:24-127,
file_client.py LmdbBackend) to turn thousands-of-small-files datasets
into one sequentially-readable file. The lmdb package is not in this
image (and the reference's glob dataset ignored its own `io_backend:
lmdb` anyway — paired_image_dataset.py:61-80), so this is a
dependency-free equivalent:

    [ magic "FDNPACK1" ][ raw file bytes ... ][ JSON index ]
    [ uint64 index_offset ][ uint64 index_size ]  (16-byte footer)

* entries are the original encoded bytes (PNG/JPEG), so decode paths —
  cv2 and the native C++ loader alike — see identical data;
* the JSON index maps key -> (offset, size); keys default to paths
  relative to a root, preserving the glob-sort order the paired dataset
  relies on;
* reads use os.pread on one shared fd: thread-safe without locks, no
  mmap (works on any filesystem the image mounts).
"""

import glob as _glob
import json
import os
import struct

_MAGIC = b"FDNPACK1"
_FOOTER = struct.Struct("<QQ")


def write_pack(paths, pack_path, root=None, keys=None):
    """Pack `paths` (list or glob pattern) into pack_path.

    keys: explicit entry keys; default = path relative to `root`
    (or the basename when root is None). Returns the list of keys in
    pack order (sorted-path order, matching the glob dataset).
    """
    if isinstance(paths, str):
        paths = sorted(_glob.glob(paths))
    if not paths:
        raise ValueError("no input files to pack")
    if keys is None:
        keys = [os.path.relpath(p, root) if root else os.path.basename(p)
                for p in paths]
    if len(set(keys)) != len(keys):
        raise ValueError("duplicate pack keys (pass explicit keys or root)")
    index = []
    tmp = pack_path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(pack_path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        for key, p in zip(keys, paths):
            with open(p, "rb") as src:
                data = src.read()
            index.append({"key": key, "offset": f.tell(),
                          "size": len(data)})
            f.write(data)
        idx_off = f.tell()
        idx_bytes = json.dumps(index).encode()
        f.write(idx_bytes)
        f.write(_FOOTER.pack(idx_off, len(idx_bytes)))
    os.replace(tmp, pack_path)  # atomic publish
    return keys


class PackReader:
    """Random access into an FDNPack. Thread-safe (os.pread)."""

    def __init__(self, pack_path):
        self._fd = os.open(pack_path, os.O_RDONLY)
        size = os.fstat(self._fd).st_size
        if size < len(_MAGIC) + _FOOTER.size:
            raise IOError(f"not an FDNPack: {pack_path} (too small)")
        if os.pread(self._fd, len(_MAGIC), 0) != _MAGIC:
            raise IOError(f"not an FDNPack: {pack_path} (bad magic)")
        idx_off, idx_size = _FOOTER.unpack(
            os.pread(self._fd, _FOOTER.size, size - _FOOTER.size))
        entries = json.loads(os.pread(self._fd, idx_size, idx_off))
        self._index = {e["key"]: (e["offset"], e["size"]) for e in entries}
        self._order = [e["key"] for e in entries]

    def keys(self):
        """Keys in pack (= sorted-path) order."""
        return list(self._order)

    def __len__(self):
        return len(self._order)

    def __contains__(self, key):
        return key in self._index

    def get(self, key):
        off, size = self._index[key]
        return os.pread(self._fd, size, off)

    def close(self):
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None

    def __del__(self):  # best-effort fd cleanup
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass
