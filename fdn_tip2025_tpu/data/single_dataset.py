"""LQ-only dataset for blind/no-reference inference.

Parity: reference basicsr/data/single_image_dataset.py:10-67 — folder /
meta-info-file listing modes (the lmdb mode is gated on the lmdb package
like utils.file_client).
"""

import glob
import os

import numpy as np

from fdn_tip2025_tpu.utils.img_io import imread


class SingleImageDataset:
    def __init__(self, opt):
        """opt: dataroot_lq (dir or glob), optional meta_info_file, or
        io_backend: {type: pack, pack_lq: <.fdnpack>} (FDNPack)."""
        self.opt = opt
        self._pack = None
        io = opt.get("io_backend") or {}
        if io.get("type") == "pack":
            from fdn_tip2025_tpu.data.pack import PackReader
            self._pack = PackReader(io["pack_lq"])
            self.paths = self._pack.keys()
            return
        root = opt["dataroot_lq"]
        meta = opt.get("meta_info_file")
        if meta:
            with open(meta) as f:
                names = [line.split(" ")[0].strip() for line in f if
                         line.strip()]
            self.paths = [os.path.join(root, n) for n in names]
        elif any(ch in root for ch in "*?["):
            self.paths = sorted(glob.glob(root))
        else:
            self.paths = sorted(
                os.path.join(root, n) for n in os.listdir(root)
                if n.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")))

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx, rng=None):
        if self._pack is not None:
            from fdn_tip2025_tpu.utils.file_client import imfrombytes
            lq = np.ascontiguousarray(imfrombytes(
                self._pack.get(self.paths[idx]), float32=True)[..., ::-1])
            return {"lq": lq, "lq_path": self.paths[idx]}
        return {"lq": imread(self.paths[idx]), "lq_path": self.paths[idx]}
