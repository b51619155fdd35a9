"""Training-engine smoke tests on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax

from fdn_tip2025_tpu.parallel.mesh import make_mesh
from fdn_tip2025_tpu.train.engine import create_trainer
from fdn_tip2025_tpu.utils.pytree import flatten


def _opt(model_type, lr=1e-3):
    return {
        "name": "smoke", "model_type": model_type, "scale": 1,
        "manual_seed": 0, "use_ratio": True,
        "train": {
            "optim_g": {"type": "AdamW", "lr": lr, "weight_decay": 1e-3,
                        "betas": [0.9, 0.9]},
            "scheduler": {"type": "TrueCosineAnnealingLR", "T_max": 100,
                          "eta_min": 1e-7},
            "total_iter": 100, "warmup_iter": -1,
        },
    }


def _batch(rng, n, size):
    return {"lq": rng.random((n, size, size, 3), dtype=np.float32) * 0.3,
            "gt": rng.random((n, size, size, 3), dtype=np.float32)}


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_mar_trainer_step(rng):
    mesh = make_mesh(8)
    tr = create_trainer(_opt("ImageRestorationModel_ipretrain", 1e-4),
                        mesh=mesh)
    before = {k: np.asarray(v).copy()
              for k, v in list(flatten(tr.trainable).items())[:3]}
    aux1 = tr.train_step(_batch(rng, 8, 32))
    aux2 = tr.train_step(_batch(rng, 8, 32))
    assert np.isfinite(float(aux1["l_total"]))
    assert np.isfinite(float(aux2["l_total"]))
    after = flatten(tr.trainable)
    changed = any(
        not np.allclose(before[k], np.asarray(after[k])) for k in before)
    assert changed, "parameters did not update"


def test_lpnet_trainer_step_updates_bn_stats(rng):
    mesh = make_mesh(8)
    tr = create_trainer(_opt("ImageRestorationModel_ipred"), mesh=mesh)
    rm_before = np.asarray(
        tr.trainable["conv1"]["1"]["running_mean"]).copy()
    aux = tr.train_step(_batch(rng, 8, 64))
    assert np.isfinite(float(aux["l_pix"]))
    rm_after = np.asarray(tr.trainable["conv1"]["1"]["running_mean"])
    assert not np.allclose(rm_before, rm_after), "BN stats did not update"


def test_fdn_trainer_freezes_mar(rng):
    # tiny check: frozen partition excludes net_a and trainable excludes it
    mesh = make_mesh(8)
    tr = create_trainer(_opt("ImageRestorationModel"), mesh=mesh)
    assert "net_a" in tr.frozen and "net_a" not in tr.trainable
    assert "net_p" in tr.trainable


@pytest.mark.slow
def test_fdn_trainer_step(rng):
    mesh = make_mesh(8)
    tr = create_trainer(_opt("ImageRestorationModel"), mesh=mesh)
    mar_before = np.asarray(
        flatten(tr.frozen)["net_a.net.f3.0.weight"]).copy()
    aux = tr.train_step(_batch(rng, 8, 32))
    assert np.isfinite(float(aux["l_total"]))
    mar_after = np.asarray(flatten(tr.frozen)["net_a.net.f3.0.weight"])
    np.testing.assert_array_equal(mar_before, mar_after)


def test_nonfinite_gradient_step_is_skipped(rng):
    """Round-5 guard (train/optim.py apply_if_finite): a batch whose
    gradients go non-finite must apply NO update (instead of NaN'ing
    every weight through the global-norm clip — observed for real at
    iter ~3200 of the 5k recipe run), surface a skip counter, and the
    next clean batch must train normally."""
    mesh = make_mesh(8)
    tr = create_trainer(_opt("ImageRestorationModel_ipretrain", 1e-4),
                        mesh=mesh)
    clean = _batch(rng, 8, 32)
    tr.train_step(clean)
    before = {k: np.asarray(v).copy()
              for k, v in flatten(tr.trainable).items()}

    bad = {k: v.copy() for k, v in clean.items()}
    bad["gt"][0, 0, 0, 0] = np.nan  # NaN loss -> NaN grads
    aux = tr.train_step(bad)
    assert int(aux["n_nonfinite_total"]) == 1
    after = flatten(tr.trainable)
    for k in before:
        np.testing.assert_array_equal(before[k], np.asarray(after[k]),
                                      err_msg=f"{k} changed on a "
                                              "non-finite step")

    aux = tr.train_step(clean)
    assert np.isfinite(float(aux["l_total"]))
    assert int(aux["n_nonfinite_total"]) == 1  # no new skips
    changed = any(not np.allclose(before[k], np.asarray(flatten(
        tr.trainable)[k])) for k in before)
    assert changed, "clean step after a skipped step did not update"
