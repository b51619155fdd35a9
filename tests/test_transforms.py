"""Paired-transform parity vs the reference (basicsr/data/transforms.py).

The reference crops with stdlib `random`; ours take an explicit
numpy Generator (host-side determinism per worker). Parity here means:
same crop-coordinate semantics (inclusive randint bounds, scaled gt
origin) and identical outputs when the random draws are pinned equal.
"""

import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from fdn_tip2025_tpu.data.transforms import (  # noqa: E402
    paired_random_crop, paired_random_crop_hw,
)

REF = "/root/reference"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference not mounted")


def _import_ref_transforms():
    # load the module by file path: the basicsr.data package __init__
    # pulls torchvision.transforms.functional (absent here), while
    # transforms.py itself needs only cv2 + random
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_transforms", os.path.join(REF, "basicsr/data/transforms.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _PinnedRng:
    """numpy-Generator facade returning pre-recorded integers, so ours and
    the reference (whose random.randint we pin the same way) see
    identical crop origins."""

    def __init__(self, values):
        self.values = list(values)

    def integers(self, low, high):
        v = self.values.pop(0)
        assert low <= v < high, f"draw {v} outside [{low},{high})"
        return v


@needs_ref
@pytest.mark.parametrize("scale,ph,pw", [(1, 24, 40), (2, 32, 16)])
def test_paired_random_crop_hw_parity(scale, ph, pw):
    ref_t = _import_ref_transforms()
    rng = np.random.default_rng(0)
    h_lq, w_lq = 50, 60
    lq = rng.random((h_lq, w_lq, 3)).astype(np.float32)
    gt = rng.random((h_lq * scale, w_lq * scale, 3)).astype(np.float32)

    top, left = 7, 11
    orig = random.randint
    random.randint = lambda a, b: {  # reference draws (inclusive bounds)
        (0, h_lq - ph // scale): top,
        (0, w_lq - pw // scale): left}[(a, b)]
    try:
        gt_ref, lq_ref = ref_t.paired_random_crop_hw(
            gt.copy(), lq.copy(), ph, pw, scale, "x")
    finally:
        random.randint = orig

    gt_ours, lq_ours = paired_random_crop_hw(
        gt, lq, ph, pw, scale, _PinnedRng([top, left]))
    np.testing.assert_array_equal(gt_ours, gt_ref)
    np.testing.assert_array_equal(lq_ours, lq_ref)
    assert gt_ours.shape == (ph, pw, 3)
    assert lq_ours.shape == (ph // scale, pw // scale, 3)


def test_paired_random_crop_hw_square_matches_square_variant():
    rng_img = np.random.default_rng(1)
    lq = rng_img.random((40, 48, 3)).astype(np.float32)
    gt = rng_img.random((40, 48, 3)).astype(np.float32)
    g1, l1 = paired_random_crop(gt, lq, 16, 1, _PinnedRng([3, 9]))
    g2, l2 = paired_random_crop_hw(gt, lq, 16, 16, 1, _PinnedRng([3, 9]))
    np.testing.assert_array_equal(g1, g2)
    np.testing.assert_array_equal(l1, l2)


def test_paired_random_crop_hw_rejects_small_input():
    rng = np.random.default_rng(2)
    lq = rng.random((8, 8, 3)).astype(np.float32)
    gt = rng.random((8, 8, 3)).astype(np.float32)
    with pytest.raises(ValueError):
        paired_random_crop_hw(gt, lq, 16, 8, 1, np.random.default_rng(0))
