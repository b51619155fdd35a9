"""val.grids tiled validation + LPNet validation protocol (VERDICT r1
items 5 and 6): config-driven grids/grids_inverse in the validation
forwards (reference image_restoration_model.py:261-339,737-743) and the
_ipred frozen-FDN restore protocol (:1488-1499,:1949-1957)."""

import types

import numpy as np
import pytest

import jax.numpy as jnp

from fdn_tip2025_tpu.train import infer_adapters
from fdn_tip2025_tpu.train.infer_adapters import (
    make_predict_fn, grid_sizes, lpnet_ratio_validation,
)


def _fake_trainer(params=None):
    return types.SimpleNamespace(params=params or {"w": jnp.ones(())},
                                 use_ratio=True, variant="fdn")


def test_grid_sizes_from_config():
    assert grid_sizes({"crop_size_h": 64, "crop_size_w": 48}, 100, 100) \
        == (64, 48)
    assert grid_sizes({"crop_size_h_ratio": 0.5, "crop_size_w_ratio": 0.25},
                      100, 200) == (50, 50)
    # clamped to the image size
    assert grid_sizes({"crop_size_h": 512, "crop_size_w": 512}, 100, 80) \
        == (100, 80)


def test_grids_matches_full_for_translation_invariant_model(monkeypatch):
    """With an elementwise forward, overlapped tiling + count-average
    stitching must reproduce the full-image result exactly — validates
    the ratio broadcast, pad/unpad, and stitch wiring."""
    def fake_fwd(params, x, ratio):
        # every output pixel = 2*x + ratio: exposes BOTH the content
        # wiring and the per-tile ratio value in the stitched result
        out = x * 2.0 + ratio[:, :, None, None]
        return out, out, out, out

    monkeypatch.setattr(infer_adapters, "fdn_forward", fake_fwd)
    rng = np.random.default_rng(0)
    lq = rng.random((40, 56, 3)).astype(np.float32)
    gt = rng.random((40, 56, 3)).astype(np.float32)

    tr = _fake_trainer()
    full = make_predict_fn("ImageRestorationModel", tr)(lq, gt)
    tiled = make_predict_fn(
        "ImageRestorationModel", tr,
        val_opt={"grids": True, "crop_size_h": 24, "crop_size_w": 32,
                 "max_minibatch": 2})(lq, gt)
    # equality requires the FULL-image ratio broadcast to every tile
    # (feed_data_ir computes ratio before grids in the reference)
    np.testing.assert_allclose(tiled, full, atol=1e-6)


def test_grids_single_tile_identical(monkeypatch):
    """crop == image size -> one tile -> bit-identical to grids-off."""
    def fake_fwd(params, x, ratio):
        out = jnp.tanh(x) * ratio[:, :, None, None]
        return out, out, out, out

    monkeypatch.setattr(infer_adapters, "fdn_forward", fake_fwd)
    rng = np.random.default_rng(1)
    lq = rng.random((32, 32, 3)).astype(np.float32)
    gt = rng.random((32, 32, 3)).astype(np.float32)
    tr = _fake_trainer()
    full = make_predict_fn("ImageRestorationModel", tr)(lq, gt)
    tiled = make_predict_fn(
        "ImageRestorationModel", tr,
        val_opt={"grids": True, "crop_size_h": 32, "crop_size_w": 32})(
            lq, gt)
    np.testing.assert_array_equal(tiled, full)


def test_lpnet_predict_requires_fdn():
    with pytest.raises(ValueError, match="pretrain_network_fft"):
        make_predict_fn("ImageRestorationModel_ipred", _fake_trainer())


def test_lpnet_protocol_restores_through_fdn(monkeypatch):
    """_ipred validation: ratio = mean(gray lq)/pred drives a frozen-FDN
    restore (image_restoration_model.py:1949-1957)."""
    def fake_lpnet(params, x):
        return jnp.full((x.shape[0], 1), 0.25, x.dtype)

    def fake_fdn(params, x, ratio):
        out = x + ratio[:, :, None, None]
        return out, out, out, out

    monkeypatch.setattr(infer_adapters, "ipredict_forward", fake_lpnet)
    monkeypatch.setattr(infer_adapters, "fdn_forward", fake_fdn)
    lq = np.full((32, 32, 3), 0.5, np.float32)
    predict = make_predict_fn("ImageRestorationModel_ipred",
                              _fake_trainer(),
                              fdn_params={"w": jnp.ones(())})
    out = predict(lq)
    # gray mean of the 0.5 constant image = 0.5 (x the torchvision
    # luminance weights summing to 0.9999); ratio ~= 0.5/0.25 = 2, and
    # the fake FDN adds the ratio to every pixel
    np.testing.assert_allclose(out, lq + 2.0, rtol=2e-4)


def test_lpnet_ratio_validation_runs():
    """Fallback LPNet validation (no frozen FDN): mean |pred - gray(gt)|
    through the real LPNet forward."""
    import jax

    from fdn_tip2025_tpu.models import init_ipredict

    params = init_ipredict(jax.random.PRNGKey(0))
    tr = types.SimpleNamespace(params=params, use_ratio=True)
    rng = np.random.default_rng(0)
    ds = [{"lq": rng.random((32, 32, 3)).astype(np.float32),
           "gt": rng.random((32, 32, 3)).astype(np.float32)}
          for _ in range(2)]
    res = lpnet_ratio_validation(tr, ds)
    assert np.isfinite(res["ratio_l1"]) and res["ratio_l1"] >= 0


def test_validate_batched_matches_serial(rng, tmp_path):
    """validate(predict_batch_fn=..., batch_size=N): consecutive
    same-shape images stack into one forward (the dist_test.sh mesh
    analog); metrics equal the serial path exactly, and groups split at
    shape boundaries and the batch cap."""
    from fdn_tip2025_tpu.train.validation import validate

    def mk(shape, i):
        lq = rng.random(shape, dtype=np.float32)
        return {"lq": lq, "gt": np.clip(lq * 2, 0, 1),
                "lq_path": f"{i:03d}.png"}

    samples = [mk((24, 32, 3), i) for i in range(5)]
    samples += [mk((16, 16, 3), i + 5) for i in range(2)]

    class DS:
        def __len__(self):
            return len(samples)

        def __getitem__(self, i):
            return samples[i]

    def predict(lq, gt=None):
        return np.tanh(np.asarray(lq) * 2.0)

    sizes = []

    def predict_batch(lqs, gts=None):
        sizes.append(lqs.shape[0])
        return np.tanh(lqs * 2.0)

    metrics = {"psnr": {"type": "calculate_psnr", "crop_border": 0}}
    serial = validate(predict, DS(), metrics)
    batched = validate(predict, DS(), metrics,
                       predict_batch_fn=predict_batch, batch_size=4)
    assert sizes == [4, 1, 2]
    np.testing.assert_allclose(batched["psnr"], serial["psnr"], rtol=1e-12)


def test_predict_batch_matches_serial_on_mesh(monkeypatch):
    """make_predict_fn's .batch (dist_validation analog): a mesh-sharded
    batched forward gives the same outputs as the per-image path, with
    trailing groups padded to an even device shard."""
    from fdn_tip2025_tpu.parallel.mesh import make_mesh

    def fake_fwd(params, x, ratio):
        out = x * 2.0 + ratio[:, :, None, None]
        return out, out, out, out

    monkeypatch.setattr(infer_adapters, "fdn_forward", fake_fwd)
    rng = np.random.default_rng(2)
    lqs = rng.random((3, 40, 56, 3)).astype(np.float32)
    gts = rng.random((3, 40, 56, 3)).astype(np.float32)

    tr = _fake_trainer()
    tr.mesh = make_mesh(8)
    predict = make_predict_fn("ImageRestorationModel", tr)
    serial = np.stack([predict(lq, gt) for lq, gt in zip(lqs, gts)])
    batched = predict.batch(lqs, gts)  # 3 pads to 8 on the mesh
    np.testing.assert_allclose(batched, serial, atol=1e-6)

    # grids mode has no batched path (tiles already batch per image)
    tiled = make_predict_fn(
        "ImageRestorationModel", tr,
        val_opt={"grids": True, "crop_size_h": 24, "crop_size_w": 32})
    assert tiled.batch is None
