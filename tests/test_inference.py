"""FDNPredictor / tiled restore / scheduler behavior tests (CPU)."""

import numpy as np
import pytest

import jax

from fdn_tip2025_tpu.inference import FDNPredictor


@pytest.fixture(scope="module")
def predictor():
    return FDNPredictor(
        variant="lolblur",
        lpnet_ckpt="/root/reference/checkpoint/LPNet_lolblur.pth")


def test_predictor_pads_and_crops(rng, predictor):
    img = rng.random((40, 52, 3), dtype=np.float32)
    out = predictor.restore(img)
    assert out.shape == (40, 52, 3)
    assert np.isfinite(out).all()


def test_predictor_shape_bucketing(rng, predictor):
    predictor.restore(rng.random((40, 52, 3), dtype=np.float32))
    n0 = len(predictor._jit_cache)
    # same padded bucket (64x64 -> pads to 64x64): no new compile
    predictor.restore(rng.random((40, 50, 3), dtype=np.float32))
    assert len(predictor._jit_cache) == n0
    predictor.restore(rng.random((70, 52, 3), dtype=np.float32))
    assert len(predictor._jit_cache) == n0 + 1


def test_predictor_explicit_ratio_batch(rng, predictor):
    imgs = rng.random((2, 40, 40, 3), dtype=np.float32)
    out = predictor.restore(imgs, ratio=np.array([0.2, 0.8], np.float32))
    assert out.shape == (2, 40, 40, 3)
    # different ratios must give different outputs
    assert np.abs(out[0] - out[1]).max() > 1e-4


def test_uint8_wire_format(rng, predictor, monkeypatch):
    """uint8-in/uint8-out plumbing is exact: device-side normalize
    (n/255 in f32) and tensor2img quantization around a deterministic
    stand-in forward. (Cross-program comparison through the real FDN is
    meaningless with random weights — measured chaos, OPTIMIZATIONS.md;
    the real-model path is exercised by the trained-weights cross-check
    tool.)"""
    import jax.numpy as jnp

    def fake_fwd(params, x, ratio):
        return (x * jnp.asarray(0.5, x.dtype) + jnp.asarray(0.25, x.dtype),)

    monkeypatch.setattr(predictor, "_fdn_fwd", fake_fwd)
    u8 = rng.integers(0, 256, (30, 44, 3), dtype=np.uint8)
    ratio = np.array([0.5], np.float32)

    # f32 egress with uint8 ingress: device normalize matches the host
    # f32 divide to <=1 ULP (XLA lowers /255 to *(1/255))
    out_f = predictor.restore(u8, ratio=ratio)
    ref = u8.astype(np.float32) / 255.0 * 0.5 + 0.25
    np.testing.assert_allclose(out_f, ref.astype(np.float32),
                               rtol=3e-7, atol=1e-7)

    # uint8 egress: on-device tensor2img (clip/round half-even)
    out_u = predictor.restore(u8, ratio=ratio, output="uint8")
    assert out_u.dtype == np.uint8
    np.testing.assert_array_equal(
        out_u, np.round(np.clip(ref, 0, 1) * 255.0).astype(np.uint8))

    # pad/crop round trip unaffected by the wire dtype
    assert out_u.shape == u8.shape


def test_predictor_scalar_ratio_broadcast(rng, predictor, monkeypatch):
    """A scalar ratio applies to EVERY image of a batch (the reference
    broadcasts a (1,1) ratio in MAR); a wrong-length ratio errors
    instead of silently padding with 0.5."""
    import jax.numpy as jnp

    def fake_fwd(params, x, ratio):
        return (x + ratio[:, 0][:, None, None, None].astype(x.dtype),)

    monkeypatch.setattr(predictor, "_fdn_fwd", fake_fwd)
    imgs = rng.random((3, 24, 40, 3), dtype=np.float32)
    out_scalar = predictor.restore(imgs, ratio=0.8)
    out_explicit = predictor.restore(
        imgs, ratio=np.full((3,), 0.8, np.float32))
    np.testing.assert_array_equal(out_scalar, out_explicit)
    np.testing.assert_allclose(out_scalar, imgs + 0.8, atol=1e-6)
    with pytest.raises(ValueError, match="ratio batch"):
        predictor.restore(imgs, ratio=np.array([0.2, 0.8], np.float32))


def test_restore_tiled_lolv1_ratio_protocol(rng):
    """restore_tiled with ratio=None on the lolv1 variant must apply the
    mean(gray)/pred protocol (inference_fdn_lolv1.py:58-64), same as the
    batched no-ratio path — not the raw LPNet prediction."""
    import jax.numpy as jnp

    pred = FDNPredictor.__new__(FDNPredictor)
    pred.variant = "lolv1"
    pred.dtype = jnp.float32
    pred.mesh = None
    pred.fdn_params = {}
    pred._jit_cache = {}
    # the stand-in forward paints the image with the ratio it was given,
    # so the stitched output reveals the ratio the tiled path used
    pred._fdn_fwd = lambda p, x, r: (
        jnp.broadcast_to(r[:, 0][:, None, None, None], x.shape),)
    lp_pred = 0.25
    pred.predict_ratio = lambda img: np.full((1, 1), lp_pred, np.float32)

    img = rng.integers(0, 256, (48, 72, 3), dtype=np.uint8)
    out = pred.restore_tiled(img, crop=32, batch_size=2)
    gray = float(np.mean(
        (img.astype(np.float32) / 255.0)
        @ np.asarray((0.2989, 0.587, 0.114), np.float32)))
    np.testing.assert_allclose(out, gray / lp_pred, rtol=1e-5)

    # lolblur keeps the raw prediction
    pred.variant = "lolblur"
    pred._jit_cache = {}
    out = pred.restore_tiled(img, crop=32, batch_size=2)
    np.testing.assert_allclose(out, lp_pred, rtol=1e-5)


def test_restore_tiled_matches_plain(rng, predictor, monkeypatch):
    """restore_tiled (grids protocol as a predictor method) with a
    pointwise stand-in forward: overlap averaging of identical values
    reproduces the plain pointwise result, on both wire dtypes."""
    import jax.numpy as jnp

    def fake_fwd(params, x, ratio):
        return (x * jnp.asarray(0.5, x.dtype) + jnp.asarray(0.25, x.dtype),)

    monkeypatch.setattr(predictor, "_fdn_fwd", fake_fwd)
    u8 = rng.integers(0, 256, (48, 72, 3), dtype=np.uint8)
    ref = u8.astype(np.float32) / 255.0 * 0.5 + 0.25

    out = predictor.restore_tiled(u8, crop=32, ratio=0.4, batch_size=2)
    np.testing.assert_allclose(out, ref, rtol=3e-7, atol=2e-7)

    out8 = predictor.restore_tiled(u8, crop=32, ratio=0.4, batch_size=2,
                                   output="uint8")
    assert out8.dtype == np.uint8
    np.testing.assert_array_equal(
        out8, np.round(np.clip(out, 0, 1) * 255.0).astype(np.uint8))

    # smaller than one tile: falls back to the plain bucketed restore
    small = u8[:20, :24]
    out_s = predictor.restore_tiled(small, crop=32, ratio=0.4)
    np.testing.assert_allclose(
        out_s, small.astype(np.float32) / 255.0 * 0.5 + 0.25,
        rtol=3e-7, atol=2e-7)


def test_tiled_restore_with_mesh(rng):
    from fdn_tip2025_tpu.parallel.spatial import tiled_restore
    from fdn_tip2025_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    img = rng.random((48, 72, 3)).astype(np.float32)

    import jax.numpy as jnp

    @jax.jit
    def fwd(tiles):
        return tiles * 2.0

    out = tiled_restore(fwd, img, 32, 32, batch_size=8, mesh=mesh)
    np.testing.assert_allclose(out, img * 2.0, atol=1e-6)


def test_schedulers_shapes():
    from fdn_tip2025_tpu.train.schedulers import (
        linear_lr, vibrate_lr, multistep_restart, cosine_annealing_restart,
    )
    assert abs(float(linear_lr(1e-3, 100)(50)) - 5e-4) < 1e-9
    v = vibrate_lr(1e-3, 8000)
    # cycle start (t=0) gives lr 0 past the first half-cycle — reference
    # behavior (lr_scheduler.py:89-112); mid-cycle is positive
    assert float(v(150)) > 0
    assert float(v(100)) == 0.0
    m = multistep_restart(1e-3, [10, 20], gamma=0.1)
    assert abs(float(m(15)) - 1e-4) < 1e-9
    c = cosine_annealing_restart(1e-3, [100, 100], (1, 0.5), 1e-7)
    assert abs(float(c(0)) - 1e-3) < 1e-6
    assert float(c(150)) < 5.2e-4
