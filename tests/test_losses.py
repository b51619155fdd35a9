"""Loss-function parity vs reference losses.py (imported, CPU)."""

import numpy as np
import torch

import jax.numpy as jnp

from fdn_tip2025_tpu.train import losses as L
from tests.torch_ref import import_ref_arch, to_nchw

import_ref_arch("FDN_arch")  # installs stubs + sys.path
from basicsr.models.losses.losses import L1Loss, FFTLoss, MSELoss  # noqa


def rand(rng, shape):
    return rng.random(shape, dtype=np.float32)


def test_l1(rng):
    a, b = rand(rng, (2, 8, 8, 3)), rand(rng, (2, 8, 8, 3))
    ref = L1Loss(loss_weight=1.0)(to_nchw(a), to_nchw(b)).item()
    got = float(L.l1_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ref - got) < 1e-6


def test_mse(rng):
    a, b = rand(rng, (2, 8, 8, 3)), rand(rng, (2, 8, 8, 3))
    ref = MSELoss(loss_weight=1.0)(to_nchw(a), to_nchw(b)).item()
    got = float(L.mse_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ref - got) < 1e-6


def test_fft_loss(rng):
    a, b = rand(rng, (2, 16, 16, 3)), rand(rng, (2, 16, 16, 3))
    ref = FFTLoss(loss_weight=0.1)(to_nchw(a), to_nchw(b)).item()
    got = float(L.fft_loss(jnp.asarray(a), jnp.asarray(b), loss_weight=0.1))
    assert abs(ref - got) / max(abs(ref), 1e-8) < 1e-4


def test_mar_loss_no_vgg(rng):
    from basicsr.models.losses.losses import MARLoss
    a = rand(rng, (1, 16, 16, 3))
    b = rand(rng, (1, 32, 32, 3))
    dummy_vgg = lambda x, y: (torch.tensor(0.0), None)  # noqa: E731
    ref_mod = MARLoss(scale=0.5)
    # reference MARLoss lacks an explicit return; torch returns None — it
    # computes l internally. Recompute its formula here as the oracle.
    y_d = torch.nn.Upsample(scale_factor=0.5, mode="bilinear",
                            align_corners=False)(to_nchw(b))
    mse = torch.nn.MSELoss()
    xa = torch.abs(torch.fft.rfft2(to_nchw(a).float(), norm="backward"))
    ya = torch.abs(torch.fft.rfft2(y_d.float(), norm="backward"))
    ref = (mse(to_nchw(a), y_d) + 0.01 * mse(xa, ya)).item()
    got = float(L.mar_loss(jnp.asarray(a), jnp.asarray(b), None, scale=0.5))
    assert abs(ref - got) / max(abs(ref), 1e-8) < 1e-3


def test_scheduler_true_cosine():
    from fdn_tip2025_tpu.train.schedulers import true_cosine_annealing
    lin = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(lin.parameters(), lr=1e-3)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=1000,
                                                     eta_min=1e-7)
    ours = true_cosine_annealing(1e-3, 1000, 1e-7)
    for step in range(50):
        ref_lr = sch.get_last_lr()[0]
        assert abs(float(ours(step)) - ref_lr) < 1e-9, step
        opt.step()
        sch.step()


def test_psnr_loss(rng):
    a, b = rand(rng, (2, 8, 8, 3)), rand(rng, (2, 8, 8, 3))
    # reference PSNRLoss: scale * log(mse(per image)+1e-8).mean()
    got = float(L.psnr_loss(jnp.asarray(a), jnp.asarray(b)))
    import math
    at, bt = to_nchw(a), to_nchw(b)
    mse = ((at - bt) ** 2).mean(dim=(1, 2, 3))
    ref = (10 / math.log(10)) * torch.log(mse + 1e-8).mean()
    assert abs(got - ref.item()) < 1e-5
