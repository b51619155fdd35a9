"""LMDB builder roundtrip (skips when the lmdb package is absent —
it is not installed in this image; the builders import-gate)."""

import numpy as np
import pytest

lmdb = pytest.importorskip("lmdb")
if not hasattr(lmdb, "open"):
    # tests/torch_ref.py installs an empty `lmdb` stub so the reference's
    # basicsr imports succeed; that stub must not count as the real package
    pytest.skip("lmdb is the torch_ref test stub, not the real package",
                allow_module_level=True)

import cv2  # noqa: E402

from fdn_tip2025_tpu.data.lmdb_util import (  # noqa: E402
    create_lmdb_for_folder, read_img_lmdb,
)


def test_lmdb_roundtrip(tmp_path, rng):
    src = tmp_path / "imgs" / "a"
    src.mkdir(parents=True)
    imgs = {}
    for i in range(3):
        img = (rng.random((16, 20, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(src / f"{i:04d}.png"), img)
        imgs[f"a/{i:04d}"] = img
    out = create_lmdb_for_folder(str(tmp_path / "imgs"),
                                 str(tmp_path / "out.lmdb"))
    env = lmdb.open(out, readonly=True, lock=False)
    for key, img in imgs.items():
        back = read_img_lmdb(env, key)
        np.testing.assert_array_equal(back, img)
    meta = (tmp_path / "out.lmdb" / "meta_info.txt").read_text()
    assert len(meta.strip().splitlines()) == 3
