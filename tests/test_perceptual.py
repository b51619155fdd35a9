"""Perceptual-VGG19 / LPIPS-VGG16 parity without pretrained weights.

Strategy (VERDICT r1 #6): the torchvision stub's vgg19()/vgg16() return
RANDOM-init plain-torch replicas of the torchvision layouts, so the
reference's own PerceptualLoss/VGGFeatureExtractor (losses.py:230-447) can
be instantiated and compared feature-for-feature against
fdn_tip2025_tpu.train.perceptual / metrics.lpips fed the exported state
dict. The LPIPS reference computation (scripts/metrics/calculate_lpips.py
semantics, lpips-VGG normalize=True) is reproduced in-test in torch.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tests.conftest import assert_close
from tests.torch_ref import import_ref_arch, to_nchw, make_random_vgg

import_ref_arch("FDN_arch")  # installs stubs + reference sys.path

from basicsr.models.losses.losses import PerceptualLoss, MARLoss  # noqa


def _make_ref_perceptual(seed=123):
    """Reference PerceptualLoss + the identical-weights exportable net."""
    torch.manual_seed(seed)
    cri_p = PerceptualLoss(
        layer_weights={"conv1_2": 1, "conv2_2": 1, "conv3_4": 1,
                       "conv4_4": 1},
        use_input_norm=True, perceptual_weight=0.01, style_weight=0,
        range_norm=True, criterion="l1")
    torch.manual_seed(seed)
    net = make_random_vgg("vgg19")
    # guard the same-seed-same-weights assumption
    assert torch.equal(net.features[0].weight,
                       cri_p.vgg.vgg_net._modules["conv1_1"].weight)
    return cri_p, net


def _export_sd(net, tmp_path, name):
    path = str(tmp_path / name)
    torch.save({k: v.detach().clone() for k, v in net.state_dict().items()},
               path)
    return path


def test_vgg19_feature_parity(tmp_path, rng):
    from fdn_tip2025_tpu.train.perceptual import (
        load_vgg19_params, vgg19_features,
    )

    cri_p, net = _make_ref_perceptual()
    params = load_vgg19_params(_export_sd(net, tmp_path, "vgg19.pth"))
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = cri_p.vgg(to_nchw(x))
    ours = vgg19_features(params, jnp.asarray(x),
                          ("conv1_2", "conv2_2", "conv3_4", "conv4_4"),
                          use_input_norm=True, range_norm=True)
    for name in ("conv1_2", "conv2_2", "conv3_4", "conv4_4"):
        assert_close(ours[name],
                     ref[name].numpy().transpose(0, 2, 3, 1),
                     atol=2e-4, rtol=2e-4, msg=name)


def test_perceptual_loss_parity(tmp_path, rng):
    from fdn_tip2025_tpu.train.perceptual import (
        load_vgg19_params, make_perceptual_loss,
    )

    cri_p, net = _make_ref_perceptual()
    params = load_vgg19_params(_export_sd(net, tmp_path, "vgg19.pth"))
    loss = make_perceptual_loss(params)
    x = rng.random((2, 64, 64, 3), dtype=np.float32)
    y = rng.random((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref, _ = cri_p(to_nchw(x), to_nchw(y))
    assert_close(loss(jnp.asarray(x), jnp.asarray(y)), ref.item(),
                 atol=1e-6, rtol=1e-4)


def test_mar_loss_vgg_term_parity(tmp_path, rng):
    """MARLoss's dominant 10*VGG term (losses.py:764-774) with weights."""
    from fdn_tip2025_tpu.train.perceptual import (
        load_vgg19_params, make_perceptual_loss,
    )
    from fdn_tip2025_tpu.train.losses import mar_loss

    cri_p, net = _make_ref_perceptual()
    params = load_vgg19_params(_export_sd(net, tmp_path, "vgg19.pth"))
    perceptual = make_perceptual_loss(params)
    x = rng.random((1, 32, 32, 3), dtype=np.float32)  # MAR out @ 1/2 scale
    y = rng.random((1, 64, 64, 3), dtype=np.float32)  # full-res GT
    ref_ml = MARLoss(scale=0.5)
    with torch.no_grad():
        ref = ref_ml(to_nchw(x), to_nchw(y), cri_p).item()
    ours = mar_loss(jnp.asarray(x), jnp.asarray(y), perceptual, scale=0.5)
    assert_close(ours, ref, atol=1e-5, rtol=1e-4)


def _torch_lpips(net, lins, x, y):
    """The lpips-package LPIPS(net='vgg') computation, in plain torch:
    scaling layer, vgg16 relu taps {3,8,15,22,29}, unit-normalize over C,
    squared diff, 1x1 lin head, spatial mean, sum over slices
    (scripts/metrics/calculate_lpips.py:28-46 uses normalize=True)."""
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)
    taps = {3, 8, 15, 22, 29}

    def feats(z):
        z = 2 * z - 1  # normalize=True
        z = (z - shift) / scale
        out = []
        for i, mod in enumerate(net.features):
            z = mod(z)
            if i in taps:
                out.append(z)
        return out

    def unit(f):
        n = torch.sqrt(torch.sum(f ** 2, dim=1, keepdim=True))
        return f / (n + 1e-10)

    total = 0.0
    for f1, f2, w in zip(feats(x), feats(y), lins):
        d = (unit(f1) - unit(f2)) ** 2
        total = total + F.conv2d(d, w).mean(dim=(2, 3))
    return total


def test_lpips_parity(tmp_path, rng):
    from fdn_tip2025_tpu.metrics.lpips import load_lpips_params, lpips

    torch.manual_seed(7)
    net = make_random_vgg("vgg16")
    widths = [64, 128, 256, 512, 512]
    lins = [torch.rand(1, c, 1, 1) * 0.1 for c in widths]
    vgg_path = _export_sd(net, tmp_path, "vgg16.pth")
    lin_path = str(tmp_path / "lpips_lin.pth")
    torch.save({f"lin{i}.model.1.weight": w for i, w in enumerate(lins)},
               lin_path)

    params = load_lpips_params(vgg_path, lin_path)
    x = rng.random((2, 64, 64, 3), dtype=np.float32)
    y = rng.random((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = _torch_lpips(net, lins, to_nchw(x), to_nchw(y))
    ours = lpips(params, jnp.asarray(x), jnp.asarray(y), normalize=True)
    assert_close(ours, ref.numpy().reshape(-1), atol=1e-5, rtol=1e-4)
