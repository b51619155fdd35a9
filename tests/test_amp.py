"""bf16 mixed-precision training (train.mixed_precision: true).

TPU-native extra — the reference trains f32-only. Policy: forward and
backward run in bf16 (cast inside the differentiated function, so grads
land f32 on the f32 master weights), losses accumulate in f32, the
optimizer state stays f32, and the brightness ratio is always computed
in f32 (it feeds the MAR gamma exponent). LPNet refuses amp (scalar
regressor — same policy as bf16 serving, which pins LPNet to f32).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.parallel.mesh import make_mesh
from fdn_tip2025_tpu.train.engine import create_trainer


def _opt(model_type, lr, iters=30, amp=True):
    return {
        "name": "amp", "model_type": model_type, "scale": 1,
        "manual_seed": 0, "use_ratio": True,
        "train": {
            "optim_g": {"type": "AdamW", "lr": lr, "weight_decay": 0.0,
                        "betas": [0.9, 0.9]},
            "scheduler": {"type": "TrueCosineAnnealingLR",
                          "T_max": iters * 10, "eta_min": 1e-7},
            "total_iter": iters * 10, "warmup_iter": -1,
            "mixed_precision": amp,
        },
    }


def _all_f32(tree):
    return all(a.dtype in (jnp.float32, jnp.int32)
               for a in jax.tree.leaves(tree))


@pytest.mark.slow  # full-FDN amp grad compile ~110 s on this host; the
# MAR amp convergence test keeps default-suite amp coverage (~40 s)
def test_fdn_amp_step_finite_and_master_f32(rng):
    mesh = make_mesh(1)
    tr = create_trainer(_opt("ImageRestorationModel", 1e-3), mesh=mesh)
    assert tr.amp
    batch = {"lq": rng.random((1, 32, 32, 3), dtype=np.float32) * 0.2,
             "gt": rng.random((1, 32, 32, 3), dtype=np.float32)}
    aux = tr.train_step(batch)
    assert np.isfinite(float(aux["l_total"]))
    # master weights and optimizer state stay f32
    assert _all_f32(tr.trainable)
    assert _all_f32(tr.opt_state)


def test_mar_amp_overfits_fixed_batch(rng):
    mesh = make_mesh(1)
    tr = create_trainer(_opt("ImageRestorationModel_ipretrain", 5e-4),
                        mesh=mesh)
    assert tr.amp
    batch = {"lq": rng.random((2, 32, 32, 3), dtype=np.float32) * 0.2,
             "gt": rng.random((2, 32, 32, 3), dtype=np.float32)}
    losses = [float(tr.train_step(batch)["l_total"]) for _ in range(30)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0] * 0.7, losses[::6]


def test_lpnet_refuses_amp(rng):
    mesh = make_mesh(1)
    with pytest.warns(UserWarning, match="mixed_precision"):
        tr = create_trainer(_opt("ImageRestorationModel_ipred", 1e-3),
                            mesh=mesh)
    assert not tr.amp
