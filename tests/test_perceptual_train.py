"""The FULL reference training objective with the perceptual term ACTIVE.

Closes VERDICT-r2 Missing #1 / Weak #4: every prior train step ran with the
VGG term disabled. The reference trains FDN with L1 + 0.1*FFT + 0.01*VGG
always on (image_restoration_model.py:175-177,477-491) and MARLoss with a
10x-weighted VGG term (losses.py:764-774). Real weights are env-blocked, but
the gradient path is weight-agnostic — random VGG19 filters exercise it
completely.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.parallel.mesh import make_mesh
from fdn_tip2025_tpu.train.engine import create_trainer
from fdn_tip2025_tpu.train.perceptual import (
    init_vgg19_params, make_perceptual_loss,
)
from fdn_tip2025_tpu.utils.pytree import flatten


def _opt(model_type, lr=1e-4):
    return {
        "name": "vgg_smoke", "model_type": model_type, "scale": 1,
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


@pytest.fixture(scope="module")
def vgg_params():
    return init_vgg19_params(jax.random.PRNGKey(7))


def test_perceptual_loss_grad_flows(vgg_params, rng):
    """d(perceptual)/d(pred) is finite and nonzero — the VGG branch is a
    real gradient path, not a constant."""
    loss = make_perceptual_loss(vgg_params)
    pred = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    target = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    val, g = jax.value_and_grad(lambda p: loss(p, target))(pred)
    assert np.isfinite(float(val)) and float(val) > 0
    gmax = float(jnp.max(jnp.abs(g)))
    assert np.isfinite(gmax) and gmax > 0


def test_mar_trainer_step_with_vgg(vgg_params, rng):
    """MARLoss with the 10x VGG term live (losses.py:764-774): one step,
    finite loss, params move, and the loss VALUE depends on the VGG term
    (same step without vgg_params gives a different l_total)."""
    mesh = make_mesh(8)
    batch = _batch(rng, 8, 32)
    tr = create_trainer(_opt("ImageRestorationModel_ipretrain"),
                        mesh=mesh, vgg_params=vgg_params)
    aux = tr.train_step({k: v.copy() for k, v in batch.items()})
    with_vgg = float(aux["l_total"])
    assert np.isfinite(with_vgg)

    with pytest.warns(UserWarning, match="perceptual term"):
        tr0 = create_trainer(_opt("ImageRestorationModel_ipretrain"),
                             mesh=mesh)
    aux0 = tr0.train_step(batch)
    without_vgg = float(aux0["l_total"])
    assert abs(with_vgg - without_vgg) > 1e-6, \
        "VGG term did not contribute to the MAR objective"


def test_fdn_loss_grads_through_vgg_branch(vgg_params, rng):
    """FDN objective L1 + 0.1*FFT + 0.01*VGG (the reference's active
    use3stage branch): l_per finite, and the perceptual term changes the
    gradient — proof the VGG branch back-propagates into FDformer.

    Calls the trainer's _loss_fn directly (one fwd+bwd, no optimizer) to
    stay fast-suite-sized; the full train step is the slow test below."""
    mesh = make_mesh(1)
    tr = create_trainer(_opt("ImageRestorationModel"), mesh=mesh,
                        vgg_params=vgg_params)
    batch = {k: jnp.asarray(v) for k, v in _batch(rng, 1, 32).items()}
    (total, aux), grads = jax.value_and_grad(
        tr._loss_fn, has_aux=True)(tr.trainable, tr.frozen, batch)
    assert np.isfinite(float(total))
    assert "l_per" in aux and np.isfinite(float(aux["l_per"]))

    tr.perceptual = None
    (_, aux0), grads0 = jax.value_and_grad(
        tr._loss_fn, has_aux=True)(tr.trainable, tr.frozen, batch)
    assert "l_per" not in aux0
    g = flatten(grads)
    g0 = flatten(grads0)
    diff = max(float(jnp.max(jnp.abs(g[k] - g0[k]))) for k in g)
    assert np.isfinite(diff) and diff > 0, \
        "perceptual term contributed no gradient to FDformer params"


@pytest.mark.slow
def test_fdn_trainer_full_step_with_vgg(vgg_params, rng):
    """Full FDN optimizer step with all three reference loss terms."""
    mesh = make_mesh(8)
    tr = create_trainer(_opt("ImageRestorationModel"), mesh=mesh,
                        vgg_params=vgg_params)
    aux = tr.train_step(_batch(rng, 8, 32))
    for k in ("l_pix", "l_fft", "l_per", "l_total"):
        assert k in aux and np.isfinite(float(aux[k])), k
