"""Gradient accumulation (train.accumulate: K): one optimizer step per K
scan-accumulated micro-batches must equal the step on the equivalent
K-times-larger batch (TPU-native extra — the reference's answer to
memory pressure was "add GPUs"; here remat trades compute and accumulate
trades wall-clock)."""

import numpy as np
import pytest

from fdn_tip2025_tpu.parallel.mesh import make_mesh
from fdn_tip2025_tpu.train.engine import create_trainer
from fdn_tip2025_tpu.utils.pytree import flatten


def _opt(model_type, accumulate=1):
    return {
        "name": "accum", "model_type": model_type, "scale": 1,
        "manual_seed": 0, "use_ratio": True,
        "train": {
            "accumulate": accumulate,
            "optim_g": {"type": "AdamW", "lr": 1e-4, "weight_decay": 1e-3,
                        "betas": [0.9, 0.9]},
            "scheduler": {"type": "TrueCosineAnnealingLR", "T_max": 100,
                          "eta_min": 1e-7},
            "total_iter": 100, "warmup_iter": -1,
        },
    }


def test_accum_matches_large_batch(rng):
    mesh = make_mesh(8)
    batch = {"lq": rng.random((16, 32, 32, 3), dtype=np.float32) * 0.3,
             "gt": rng.random((16, 32, 32, 3), dtype=np.float32)}

    plain = create_trainer(_opt("ImageRestorationModel_ipretrain"),
                           mesh=mesh)
    aux_p = plain.train_step(dict(batch))

    accum = create_trainer(
        _opt("ImageRestorationModel_ipretrain", accumulate=2), mesh=mesh)
    aux_a = accum.train_step(dict(batch))

    # same data, same init seed: the logged loss is the pre-step loss ->
    # identical up to reduction order; the updated params must agree.
    assert np.isclose(float(aux_p["l_total"]), float(aux_a["l_total"]),
                      rtol=1e-5)
    fp, fa = flatten(plain.trainable), flatten(accum.trainable)
    assert fp.keys() == fa.keys()
    for k in fp:
        np.testing.assert_allclose(np.asarray(fp[k]), np.asarray(fa[k]),
                                   rtol=2e-4, atol=2e-6, err_msg=k)


def test_accum_requires_divisible_batch(rng):
    tr = create_trainer(_opt("ImageRestorationModel_ipretrain",
                             accumulate=3), mesh=make_mesh(8))
    batch = {"lq": rng.random((16, 32, 32, 3), dtype=np.float32),
             "gt": rng.random((16, 32, 32, 3), dtype=np.float32)}
    with pytest.raises(ValueError, match="divisible"):
        tr.train_step(batch)


def test_lpnet_refuses_accumulate():
    with pytest.raises(ValueError, match="accumulate"):
        create_trainer(_opt("ImageRestorationModel_ipred", accumulate=2),
                       mesh=make_mesh(8))
