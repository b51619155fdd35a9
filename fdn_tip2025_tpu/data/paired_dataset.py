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

import numpy as np

from fdn_tip2025_tpu.utils.img_io import imread, padding_min_size
from fdn_tip2025_tpu.data.transforms import paired_random_crop, augment_pair


class PairedImageDataset:
    def __init__(self, opt):
        """opt keys: dataroot_gt, dataroot_lq (glob patterns), phase
        ('train'|'val'), gt_size, use_flip, use_rot, scale (default 1)."""
        self.opt = opt
        self.gt_paths = sorted(glob.glob(opt["dataroot_gt"]))
        self.lq_paths = sorted(glob.glob(opt["dataroot_lq"]))
        if len(self.gt_paths) != len(self.lq_paths):
            raise ValueError(
                f"paired length mismatch: {len(self.gt_paths)} gt vs "
                f"{len(self.lq_paths)} lq")
        self.scale = int(opt.get("scale", 1))
        self.is_train = opt.get("phase", "train") == "train"

    def __len__(self):
        return len(self.gt_paths)

    def __getitem__(self, idx, rng=None):
        rng = rng or np.random.default_rng()
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
