"""Drive tools/metrics_gate.py and tools/fid.py END TO END over real PNG
folders (VERDICT-r2 missing #3/#6): full CLI path — disk images in, CSV +
MEAN row / FID number out — with random weights in the exact torchvision/
lpips state-dict layouts (the pretrained blobs are env-blocked; the load
path and the computation are weight-agnostic).

Reference protocol: m.py:57-125 (per-image metrics + CSV + mean) and
fid.py:12-18 (one FID number between two folders).
"""

import csv
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_pngs(d, n, size, seed, gain=1.0):
    import cv2
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        # smooth-ish natural-statistics stand-in (pure noise breaks the
        # NIQE AGGD fit less gracefully than real images would)
        img = rng.random((size // 4, size // 4, 3))
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_CUBIC)
        img = np.clip(img * gain * 255, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(d, f"{i:03d}.png"), img)


def _run(args, extra_env=None, expect_rc=0):
    env = dict(os.environ, FDN_DEVICE="cpu", **(extra_env or {}))
    proc = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=1200)
    assert proc.returncode == expect_rc, proc.stdout + proc.stderr
    return proc.stdout + proc.stderr


def test_metrics_gate_cli_end_to_end(tmp_path):
    """psnr+ssim+niqe+lpips over two real PNG folders -> CSV with MEAN."""
    from tests.test_weights_path import (
        _save_random_vgg16, _save_random_lpips_lin,
    )
    img_dir = str(tmp_path / "results")
    ref_dir = str(tmp_path / "gt")
    _write_pngs(img_dir, 2, 224, seed=3)
    _write_pngs(ref_dir, 2, 224, seed=4)
    vgg_pth = str(tmp_path / "vgg16.pth")
    lin_pth = str(tmp_path / "lpips_lin.pth")
    _save_random_vgg16(vgg_pth)
    _save_random_lpips_lin(lin_pth)
    csv_path = str(tmp_path / "m.csv")

    out = _run(["tools/metrics_gate.py", "-m", "psnr", "ssim", "niqe",
                "lpips", "--img-dir", img_dir, "--ref-dir", ref_dir,
                "--csv", csv_path, "--lpips-vgg", vgg_pth,
                "--lpips-lin", lin_pth])

    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert [r["img"] for r in rows] == ["000.png", "001.png", "MEAN"]
    for r in rows:
        for m in ("psnr", "ssim", "niqe", "lpips"):
            assert np.isfinite(float(r[m])), (r["img"], m, r[m])
    mean = rows[-1]
    per_img = rows[:-1]
    for m in ("psnr", "ssim", "niqe", "lpips"):
        want = np.mean([float(r[m]) for r in per_img])
        assert abs(float(mean[m]) - want) < 1e-6
    assert "psnr" in out  # stdout mean dict printed


def test_metrics_gate_plugin_metric(tmp_path):
    """The m.py arbitrary-metric surface (m.py:72 accepts any pyiqa
    name): a --plugin module registers a custom metric and the CLI
    dispatches it by name; an unregistered name fails with the
    available list."""
    img_dir = str(tmp_path / "results")
    ref_dir = str(tmp_path / "gt")
    _write_pngs(img_dir, 2, 64, seed=3)
    _write_pngs(ref_dir, 2, 64, seed=4)
    plug_dir = tmp_path / "plugmods"
    plug_dir.mkdir()
    (plug_dir / "my_metric_plugin.py").write_text(
        "import numpy as np\n"
        "from fdn_tip2025_tpu.metrics import register_metric\n"
        "register_metric('mad', lambda a, b: float(np.abs(a - b).mean()))\n"
    )
    csv_path = str(tmp_path / "m.csv")
    env = {"PYTHONPATH": str(plug_dir)}

    _run(["tools/metrics_gate.py", "-m", "psnr", "mad",
          "--img-dir", img_dir, "--ref-dir", ref_dir, "--csv", csv_path,
          "--plugin", "my_metric_plugin"], extra_env=env)
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert [r["img"] for r in rows] == ["000.png", "001.png", "MEAN"]
    for r in rows:
        assert 0.0 < float(r["mad"]) < 1.0, r

    out = _run(["tools/metrics_gate.py", "-m", "musiq",
                "--img-dir", img_dir, "--ref-dir", ref_dir],
               extra_env=env, expect_rc=1)
    assert "unknown metric 'musiq'" in out and "--plugin" in out


@pytest.mark.slow
def test_fid_cli_end_to_end(tmp_path):
    """tools/fid.py over two real PNG folders with a random-weight
    torchvision inception_v3 .pth: finite FID, and identical folders
    give FID ~ 0."""
    from tests.test_inception import _random_inception
    d1 = str(tmp_path / "a")
    d2 = str(tmp_path / "b")
    _write_pngs(d1, 4, 96, seed=7)
    _write_pngs(d2, 4, 96, seed=8, gain=0.25)
    pth = str(tmp_path / "inception.pth")
    torch.save(_random_inception().state_dict(), pth)

    def fid_of(a, b):
        out = _run(["tools/fid.py", "--dir1", a, "--dir2", b,
                    "--inception-weights", pth, "--batch", "2"])
        return float([ln for ln in out.splitlines()
                      if ln.startswith("FID:")][-1].split()[1])

    # A RANDOM 94-layer inception attenuates input dependence below f32
    # noise (measured: bright-vs-dark folders differ 3e-7 in feature
    # space, so FID prints 0.0000) — discrimination needs the trained
    # weights this image cannot ship. What this test pins is the FULL
    # CLI path: PNG decode, resize, batched features, mean/cov, sqrtm,
    # one finite number out. The FID *math* is separately verified on
    # synthetic features (test_inception.py::test_fid_distance_sanity).
    fid = fid_of(d1, d2)
    fid_same = fid_of(d1, d1)
    assert np.isfinite(fid) and fid >= 0
    assert np.isfinite(fid_same) and abs(fid_same) < 1e-3
