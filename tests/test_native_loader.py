"""Native C++ image pipeline (fdn_tip2025_tpu/native) vs the cv2 path.

Contract under test (native/loader.cc header comment):
  * PNG decode bit-identical to cv2.imread(IMREAD_COLOR)+BGR->RGB;
  * JPEG decode within 1 LSB of cv2 (both run libjpeg JDCT_ISLOW);
  * reflect-pad/crop/flip/rot90 index math identical to
    data/transforms.py — whole training samples bit-identical for PNG;
  * threaded batch assembly equals per-sample calls.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from fdn_tip2025_tpu import native
from fdn_tip2025_tpu.data.paired_dataset import PairedImageDataset
from fdn_tip2025_tpu.utils.img_io import imread, padding_min_size

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader did not build")


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(7)
    for i in range(3):
        h, w = 40 + 8 * i, 56 + 4 * i
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        cv2.imwrite(str(d / f"rgb_{i}.png"), img)
    gray = rng.integers(0, 256, (48, 48), np.uint8)
    cv2.imwrite(str(d / "gray.png"), gray)
    jpg = rng.integers(0, 256, (64, 80, 3), np.uint8)
    cv2.imwrite(str(d / "photo.jpg"), jpg,
                [cv2.IMWRITE_JPEG_QUALITY, 90])
    return str(d)


def test_dims_peek(img_dir):
    for name, (h, w) in [("rgb_0.png", (40, 56)), ("gray.png", (48, 48)),
                         ("photo.jpg", (64, 80))]:
        assert native.image_dims(os.path.join(img_dir, name)) == (h, w)


def test_png_decode_bit_identical(img_dir):
    for name in ["rgb_0.png", "rgb_1.png", "gray.png"]:
        p = os.path.join(img_dir, name)
        ours = native.decode_image(p)
        ref = imread(p)
        assert ours.dtype == np.float32 and ours.shape == ref.shape
        np.testing.assert_array_equal(ours, ref, err_msg=name)


def test_jpeg_decode_close(img_dir):
    p = os.path.join(img_dir, "photo.jpg")
    ours = (native.decode_image(p) * 255).round()
    ref = (imread(p) * 255).round()
    assert np.max(np.abs(ours - ref)) <= 1.0


def test_load_pair_matches_python_chain(img_dir):
    lq_p = os.path.join(img_dir, "rgb_0.png")
    gt_p = os.path.join(img_dir, "rgb_0.png")
    crop = 32
    for top, left, do_h, do_v, do_r in [
            (0, 0, 0, 0, 0), (5, 9, 1, 0, 0), (8, 24, 0, 1, 1),
            (3, 1, 1, 1, 1)]:
        lq_n, gt_n = native.load_pair(lq_p, gt_p, top, left, crop,
                                      do_h, do_v, do_r)
        img = imread(lq_p)
        tile = img[top:top + crop, left:left + crop]
        ref = _py_aug(tile, do_h, do_v, do_r)
        np.testing.assert_array_equal(lq_n, ref)
        np.testing.assert_array_equal(gt_n, ref)


def _py_aug(img, do_h, do_v, do_r):
    """Reference augment order (data/transforms.py augment_pair)."""
    if do_h:
        img = img[:, ::-1, :]
    if do_v:
        img = img[::-1, :, :]
    if do_r:
        img = img.transpose(1, 0, 2)
    return np.ascontiguousarray(img)


def test_reflect_pad_matches_cv2(img_dir):
    """Crop larger than the image exercises the reflect-101 indexing."""
    p = os.path.join(img_dir, "rgb_0.png")  # 40x56
    crop = 64
    lq_n, _ = native.load_pair(p, p, 0, 0, crop, 0, 0, 0)
    img = imread(p)
    padded_lq, _ = padding_min_size(img, img, crop)
    np.testing.assert_array_equal(lq_n, padded_lq[:crop, :crop])


def test_dataset_native_vs_python_bit_identical(img_dir):
    opt = {"dataroot_gt": os.path.join(img_dir, "rgb_*.png"),
           "dataroot_lq": os.path.join(img_dir, "rgb_*.png"),
           "phase": "train", "gt_size": 32}
    ds_native = PairedImageDataset(dict(opt))
    assert ds_native._native is not None
    ds_py = PairedImageDataset(dict(opt, native=False))
    assert ds_py._native is None
    for idx in range(len(ds_native)):
        a = ds_native.__getitem__(idx, rng=np.random.default_rng(idx))
        b = ds_py.__getitem__(idx, rng=np.random.default_rng(idx))
        np.testing.assert_array_equal(a["lq"], b["lq"])
        np.testing.assert_array_equal(a["gt"], b["gt"])


def test_batch_equals_per_sample(img_dir):
    paths = [os.path.join(img_dir, f"rgb_{i}.png") for i in range(3)]
    tops, lefts = [0, 3, 7], [1, 0, 5]
    hs, vs, rs = [0, 1, 0], [1, 0, 0], [0, 1, 1]
    lq_b, gt_b = native.load_batch(paths, paths, tops, lefts, 24,
                                   hs, vs, rs, num_threads=2)
    assert lq_b.shape == (3, 24, 24, 3)
    for i in range(3):
        lq_i, gt_i = native.load_pair(paths[i], paths[i], tops[i],
                                      lefts[i], 24, hs[i], vs[i], rs[i])
        np.testing.assert_array_equal(lq_b[i], lq_i)
        np.testing.assert_array_equal(gt_b[i], gt_i)


def test_batch_error_reports_sample(img_dir):
    paths = [os.path.join(img_dir, "rgb_0.png"),
             os.path.join(img_dir, "nope.png")]
    # worker-thread errors must propagate to the main thread's
    # fdn_last_error (g_err is thread_local): match the cause text too
    with pytest.raises(IOError, match="nope.*fopen failed"):
        native.load_batch(paths, paths, [0, 0], [0, 0], 16,
                          [0, 0], [0, 0], [0, 0], num_threads=2)


def test_multi_reflection_pad(img_dir):
    """Crop far larger than the image: reflect-101 must tile (period
    2(n-1)), matching cv2.copyMakeBorder like the Python chain."""
    p = os.path.join(img_dir, "gray.png")  # 48x48
    crop = 128
    lq_n, _ = native.load_pair(p, p, 0, 0, crop, 0, 0, 0)
    img = imread(p)
    padded, _ = padding_min_size(img, img, crop)
    np.testing.assert_array_equal(lq_n, padded[:crop, :crop])
