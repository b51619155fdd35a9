"""Paired LQ/GT image dataset (LOL-Blur / LOL-v1 layout).

Parity: reference basicsr/data/paired_image_dataset.py — glob-based pairing
of sorted(dataroot_lq) x sorted(dataroot_gt) (:77-80; the YAML's
io_backend: lmdb is ignored there too), cv2 read -> float/255 (:97-114),
train-time pad/crop/augment (:121-131), RGB float output.

TPU-first difference: returns NHWC numpy with static crop shapes for
training; eval images are padded to a x32 multiple by the eval loop, not
here.
"""

import glob
import os

import numpy as np

from fdn_tip2025_tpu.utils.img_io import imread, padding_min_size
from fdn_tip2025_tpu.data.transforms import paired_random_crop, augment_pair


class PairedImageDataset:
    def __init__(self, opt):
        """opt keys: dataroot_gt, dataroot_lq (glob patterns), phase
        ('train'|'val'), gt_size, use_flip, use_rot, scale (default 1),
        native (bool: use the C++ decode/augment pipeline when built —
        default on; env FDN_NATIVE_LOADER=0 disables globally).

        io_backend: {type: pack, pack_gt: <.fdnpack>, pack_lq: <.fdnpack>}
        reads from FDNPack single-file datasets (tools/create_pack.py) —
        the working analog of the reference's declared-but-ignored
        `io_backend: lmdb` (paired_image_dataset.py:61-80). Entries are
        the original encoded bytes, so outputs are bit-identical to the
        glob/disk path."""
        self.opt = opt
        self._packs = None
        io = opt.get("io_backend") or {}
        if io.get("type") == "pack":
            from fdn_tip2025_tpu.data.pack import PackReader
            self._packs = (PackReader(io["pack_lq"]),
                           PackReader(io["pack_gt"]))
            self.lq_paths = self._packs[0].keys()
            self.gt_paths = self._packs[1].keys()
        else:
            self.gt_paths = sorted(glob.glob(opt["dataroot_gt"]))
            self.lq_paths = sorted(glob.glob(opt["dataroot_lq"]))
        if len(self.gt_paths) != len(self.lq_paths):
            raise ValueError(
                f"paired length mismatch: {len(self.gt_paths)} gt vs "
                f"{len(self.lq_paths)} lq")
        self.scale = int(opt.get("scale", 1))
        self.is_train = opt.get("phase", "train") == "train"
        self._native = None
        if (opt.get("native", True) and self.is_train and self.scale == 1
                and os.environ.get("FDN_NATIVE_LOADER") != "0"):
            from fdn_tip2025_tpu import native
            if native.available():
                self._native = native

    def __len__(self):
        return len(self.gt_paths)

    def _draw(self, rng, h, w, gt_size):
        """Random crop + augment draws, identical order/semantics to the
        cv2 path (paired_random_crop then augment_pair) so native and
        Python batches are bit-identical given the same rng."""
        hp, wp = max(h, gt_size), max(w, gt_size)
        top = int(rng.integers(0, hp - gt_size + 1))
        left = int(rng.integers(0, wp - gt_size + 1))
        do_h = self.opt.get("use_flip", True) and rng.random() < 0.5
        rot = self.opt.get("use_rot", True)
        do_v = rot and rng.random() < 0.5
        do_r = rot and rng.random() < 0.5
        return top, left, do_h, do_v, do_r

    def __getitem__(self, idx, rng=None):
        rng = rng or np.random.default_rng()
        if self._native is not None:
            gt_size = self.opt["gt_size"]
            try:
                if self._packs is not None:
                    lq_bytes = self._packs[0].get(self.lq_paths[idx])
                    gt_bytes = self._packs[1].get(self.gt_paths[idx])
                    h, w = self._native.image_dims_mem(lq_bytes)
                    top, left, do_h, do_v, do_r = self._draw(
                        rng, h, w, gt_size)
                    lq, gt = self._native.load_pair_mem(
                        lq_bytes, gt_bytes, top, left, gt_size,
                        do_h, do_v, do_r)
                else:
                    h, w = self._native.image_dims(self.lq_paths[idx])
                    top, left, do_h, do_v, do_r = self._draw(
                        rng, h, w, gt_size)
                    lq, gt = self._native.load_pair(
                        self.lq_paths[idx], self.gt_paths[idx], top, left,
                        gt_size, do_h, do_v, do_r)
                return {"lq": lq, "gt": gt,
                        "lq_path": self.lq_paths[idx],
                        "gt_path": self.gt_paths[idx]}
            except IOError:
                pass  # unsupported format on this sample: cv2 fallback
        if self._packs is not None:
            from fdn_tip2025_tpu.utils.file_client import imfrombytes
            lq = np.ascontiguousarray(imfrombytes(
                self._packs[0].get(self.lq_paths[idx]),
                float32=True)[..., ::-1])  # BGR -> RGB
            gt = np.ascontiguousarray(imfrombytes(
                self._packs[1].get(self.gt_paths[idx]),
                float32=True)[..., ::-1])
        else:
            gt = imread(self.gt_paths[idx])
            lq = imread(self.lq_paths[idx])
        if self.is_train:
            gt_size = self.opt["gt_size"]
            lq, gt = padding_min_size(lq, gt, gt_size)
            gt, lq = paired_random_crop(gt, lq, gt_size, self.scale, rng)
            gt, lq = augment_pair(
                [gt, lq], self.opt.get("use_flip", True),
                self.opt.get("use_rot", True), rng)
        return {"lq": lq, "gt": gt,
                "lq_path": self.lq_paths[idx],
                "gt_path": self.gt_paths[idx]}
