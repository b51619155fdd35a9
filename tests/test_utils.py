"""Utility parity: MATLAB imresize, ycbcr, img IO, pytree, spatial tiles."""

import numpy as np

from tests.torch_ref import import_ref_arch  # stubs + sys.path

import_ref_arch("FDN_arch")


def test_matlab_imresize_parity(rng):
    from basicsr.utils.matlab_functions import imresize as ref_imresize
    from fdn_tip2025_tpu.utils.matlab import imresize
    img = rng.random((37, 53, 3)).astype(np.float64)
    for scale in (0.5, 0.25, 2.0):
        ref = ref_imresize(img, scale)
        got = imresize(img, scale)
        # reference computes through float32 torch tensors -> ~1e-7 noise
        np.testing.assert_allclose(got, ref, atol=1e-5,
                                   err_msg=f"scale {scale}")


def test_rgb2ycbcr_parity(rng):
    from basicsr.utils.matlab_functions import bgr2ycbcr as ref_bgr2ycbcr
    from fdn_tip2025_tpu.metrics.color import bgr2ycbcr
    img = rng.random((16, 16, 3)).astype(np.float64)
    np.testing.assert_allclose(bgr2ycbcr(img, y_only=True),
                               ref_bgr2ycbcr(img.astype(np.float32),
                                             y_only=True), atol=1e-5)


def test_tensor2img_roundtrip(rng):
    from fdn_tip2025_tpu.utils.img_io import tensor2img
    x = rng.random((1, 8, 8, 3)).astype(np.float32)
    out = tensor2img(x, rgb2bgr=True)
    assert out.dtype == np.uint8 and out.shape == (8, 8, 3)
    np.testing.assert_array_equal(
        out[..., ::-1], (np.clip(x[0], 0, 1) * 255).round().astype(np.uint8))


def test_pytree_flatten_roundtrip():
    from fdn_tip2025_tpu.utils.pytree import flatten, unflatten
    tree = {"a": {"0": np.zeros(2), "1": {"w": np.ones(3)}}, "b": np.eye(2)}
    flat = flatten(tree)
    assert set(flat) == {"a.0", "a.1.w", "b"}
    back = unflatten(flat)
    np.testing.assert_array_equal(back["a"]["1"]["w"], np.ones(3))


def test_tile_plan_matches_reference_protocol():
    from fdn_tip2025_tpu.parallel.spatial import tile_plan
    # 100x100 image, 64-tiles: reference adaptive stride = ceil(36/1)=36
    idxes = tile_plan(100, 100, 64, 64)
    assert (0, 0) in idxes and (36, 36) in idxes
    assert all(i + 64 <= 100 and j + 64 <= 100 for i, j in idxes)


def test_tiled_restore_identity(rng):
    from fdn_tip2025_tpu.parallel.spatial import tiled_restore
    img = rng.random((40, 56, 3)).astype(np.float32)
    out = tiled_restore(lambda x: x, img, 32, 32, batch_size=2)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_file_client_disk(tmp_path):
    from fdn_tip2025_tpu.utils.file_client import FileClient, imfrombytes
    import cv2
    img = (np.arange(48).reshape(4, 4, 3) * 5).astype(np.uint8)
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, img)
    fc = FileClient("disk")
    data = fc.get(p)
    back = imfrombytes(data)
    np.testing.assert_array_equal(back, img)
