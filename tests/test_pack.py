"""FDNPack single-file dataset format (the dependency-free LMDB analog).

Parity target: reference lmdb_util/create_lmdb/file_client LmdbBackend
(basicsr/utils/lmdb_util.py:9-208) — here as an original single-file
format since lmdb is absent from this image.
"""

import os

import numpy as np
import pytest

from fdn_tip2025_tpu.data.pack import write_pack, PackReader


@pytest.fixture
def png_tree(tmp_path, rng):
    import cv2

    paths = []
    for sub, i in [("0001", 0), ("0001", 1), ("0002", 0)]:
        d = tmp_path / "imgs" / sub
        d.mkdir(parents=True, exist_ok=True)
        p = d / f"{i:04d}.png"
        cv2.imwrite(str(p), (rng.random((12, 16, 3)) * 255)
                    .astype(np.uint8))
        paths.append(str(p))
    return str(tmp_path / "imgs"), sorted(paths)


def test_pack_roundtrip_bytes(tmp_path, png_tree):
    root, paths = png_tree
    pack = str(tmp_path / "a.fdnpack")
    keys = write_pack(paths, pack, root=root)
    r = PackReader(pack)
    assert r.keys() == keys and len(r) == 3
    for key, p in zip(keys, paths):
        with open(p, "rb") as f:
            assert r.get(key) == f.read()
    assert "0001/0000.png" in keys[0].replace(os.sep, "/")


def test_pack_glob_input_and_duplicate_keys(tmp_path, png_tree):
    root, paths = png_tree
    pack = str(tmp_path / "b.fdnpack")
    keys = write_pack(os.path.join(root, "*", "*.png"), pack, root=root)
    assert len(keys) == 3
    # basename keys collide across subdirs -> explicit error
    with pytest.raises(ValueError, match="duplicate"):
        write_pack(paths, str(tmp_path / "c.fdnpack"))


def test_pack_rejects_non_pack(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"definitely not a pack" * 10)
    with pytest.raises(IOError, match="bad magic"):
        PackReader(str(p))


def test_file_client_pack_backend(tmp_path, png_tree):
    from fdn_tip2025_tpu.utils.file_client import FileClient

    root, paths = png_tree
    pack = str(tmp_path / "d.fdnpack")
    keys = write_pack(paths, pack, root=root)
    fc = FileClient(backend="pack", pack_path=pack)
    with open(paths[0], "rb") as f:
        assert fc.get(keys[0]) == f.read()


def test_pack_native_loader_bit_identical(tmp_path, png_tree, rng):
    """FDNPack + native C++ mem-decode == FDNPack + cv2 path, bitwise."""
    from fdn_tip2025_tpu import native
    from fdn_tip2025_tpu.data.paired_dataset import PairedImageDataset

    if not native.available():
        pytest.skip("native loader unavailable on this host")
    root, paths = png_tree
    lq_pack = str(tmp_path / "lq.fdnpack")
    gt_pack = str(tmp_path / "gt.fdnpack")
    write_pack(paths, lq_pack, root=root)
    write_pack(paths, gt_pack, root=root)
    io = {"type": "pack", "pack_gt": gt_pack, "pack_lq": lq_pack}
    base = {"phase": "train", "gt_size": 8, "use_flip": True,
            "use_rot": True, "dataroot_gt": "", "dataroot_lq": "",
            "io_backend": io}
    ds_nat = PairedImageDataset({**base, "native": True})
    ds_cv2 = PairedImageDataset({**base, "native": False})
    assert ds_nat._native is not None
    # mem header peek agrees with the decode
    entry = ds_nat._packs[0].get(ds_nat.lq_paths[0])
    assert native.image_dims_mem(entry) == (12, 16)
    for i in range(3):
        a = ds_nat.__getitem__(i, rng=np.random.default_rng(i))
        b = ds_cv2.__getitem__(i, rng=np.random.default_rng(i))
        np.testing.assert_array_equal(a["lq"], b["lq"])
        np.testing.assert_array_equal(a["gt"], b["gt"])


def test_single_dataset_from_pack(tmp_path, png_tree, rng):
    from fdn_tip2025_tpu.data.single_dataset import SingleImageDataset
    from fdn_tip2025_tpu.utils.img_io import imread

    root, paths = png_tree
    pack = str(tmp_path / "s.fdnpack")
    write_pack(paths, pack, root=root)
    ds = SingleImageDataset({"io_backend": {"type": "pack",
                                            "pack_lq": pack}})
    assert len(ds) == 3
    np.testing.assert_array_equal(ds[0]["lq"], imread(paths[0]))


def test_paired_dataset_from_pack_matches_disk(tmp_path, png_tree, rng):
    """Same draws -> bit-identical train samples from pack and disk."""
    from fdn_tip2025_tpu.data.paired_dataset import PairedImageDataset

    root, paths = png_tree
    lq_pack = str(tmp_path / "lq.fdnpack")
    gt_pack = str(tmp_path / "gt.fdnpack")
    write_pack(paths, lq_pack, root=root)
    write_pack(paths, gt_pack, root=root)
    glob_pat = os.path.join(root, "*", "*.png")
    base = {"phase": "train", "gt_size": 8, "use_flip": True,
            "use_rot": True, "native": False}
    ds_disk = PairedImageDataset(
        {**base, "dataroot_gt": glob_pat, "dataroot_lq": glob_pat})
    ds_pack = PairedImageDataset(
        {**base, "dataroot_gt": "", "dataroot_lq": "",
         "io_backend": {"type": "pack", "pack_gt": gt_pack,
                        "pack_lq": lq_pack}})
    assert len(ds_pack) == len(ds_disk) == 3
    for i in range(3):
        a = ds_disk.__getitem__(i, rng=np.random.default_rng(i))
        b = ds_pack.__getitem__(i, rng=np.random.default_rng(i))
        np.testing.assert_array_equal(a["lq"], b["lq"])
        np.testing.assert_array_equal(a["gt"], b["gt"])
