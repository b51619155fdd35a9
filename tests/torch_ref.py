"""Helpers for generating parity goldens from the PyTorch reference.

The reference repo is mounted read-only at /root/reference. We import its
modules (never copy them) to produce golden tensors for numerical-parity
tests. torchvision is absent in this image, so a minimal stub providing
transforms.Compose/Grayscale is installed first. Tests that need the
reference skip cleanly when it is not mounted.
"""

import sys
import types

import numpy as np
import torch

REF = "/root/reference"


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class Grayscale:
        def __init__(self, num_output_channels=1):
            self.n = num_output_channels

        def __call__(self, x):
            w = torch.tensor([0.2989, 0.587, 0.114], dtype=x.dtype,
                             device=x.device).view(1, 3, 1, 1)
            g = (x * w).sum(dim=1, keepdim=True)
            return g.expand(-1, self.n, -1, -1) if self.n > 1 else g

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    transforms.Grayscale = Grayscale
    transforms.Compose = Compose
    tv.transforms = transforms
    utils = types.ModuleType("torchvision.utils")

    def make_grid(tensor, **kw):  # only needed at import time
        return tensor

    utils.make_grid = make_grid
    tv.utils = utils

    models = types.ModuleType("torchvision.models")
    vgg_mod = types.ModuleType("torchvision.models.vgg")

    def _unavailable(*a, **k):
        raise RuntimeError("torchvision vgg weights unavailable in tests")

    for n in ("vgg11", "vgg13", "vgg11_bn", "vgg13_bn",
              "vgg16_bn", "vgg19_bn"):
        setattr(vgg_mod, n, _unavailable)
    # vgg16/vgg19 return RANDOM-INIT plain-torch replicas of the
    # torchvision layouts (cfg D/E: 3x3 convs pad 1, ReLU, MaxPool 2x2),
    # so the reference's VGGFeatureExtractor/PerceptualLoss are importable
    # and parity-testable without pretrained weights.
    vgg_mod.vgg16 = lambda *a, **k: make_random_vgg("vgg16")
    vgg_mod.vgg19 = lambda *a, **k: make_random_vgg("vgg19")
    models.vgg = vgg_mod
    tv.models = models

    tv.__path__ = []  # mark as package so "from torchvision import x" works
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.utils"] = utils
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.vgg"] = vgg_mod


def _install_misc_stubs():
    # basicsr package-level imports pull in deps not installed here.
    for name in ("lmdb", "wandb"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.__path__ = []
        skm = types.ModuleType("skimage.metrics")

        def structural_similarity(*a, **k):
            raise RuntimeError("skimage unavailable in tests")

        skm.structural_similarity = structural_similarity
        sk.metrics = skm
        sys.modules["skimage"] = sk
        sys.modules["skimage.metrics"] = skm
    if "gpu_mem_track" not in sys.modules:
        gmt = types.ModuleType("gpu_mem_track")

        class MemTracker:
            def __init__(self, *a, **k):
                pass

            def track(self, *a, **k):
                pass

        gmt.MemTracker = MemTracker
        sys.modules["gpu_mem_track"] = gmt


_VGG_CFG = {
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


def make_random_vgg(kind="vgg19"):
    """Plain-torch VGG with torchvision's `features` Sequential layout
    (same module indices as torchvision cfg D/E), randomly initialized."""
    import torch.nn as nn

    layers = []
    in_ch = 3
    for v in _VGG_CFG[kind]:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers += [nn.Conv2d(in_ch, v, kernel_size=3, padding=1),
                       nn.ReLU(inplace=True)]
            in_ch = v

    class _VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)

        def forward(self, x):
            return self.features(x)

    net = _VGG()

    def load_state_dict(sd, strict=True):  # tolerate full torchvision sds
        own = nn.Module.load_state_dict
        filtered = {k: v for k, v in sd.items() if k.startswith("features.")}
        return own(net, filtered, strict=False)

    net.load_state_dict = load_state_dict
    return net


def import_ref_arch(name="FDN_arch"):
    """Import a reference arch module (e.g. FDN_arch, LPNet_arch)."""
    _install_torchvision_stub()
    _install_misc_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib
    return importlib.import_module(f"basicsr.models.archs.{name}")


def to_nhwc(t):
    """torch NCHW tensor -> numpy NHWC."""
    return t.detach().cpu().numpy().transpose(0, 2, 3, 1)


def to_nchw(a):
    """numpy NHWC -> torch NCHW tensor."""
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


def seed_all(seed=0):
    torch.manual_seed(seed)
    np.random.seed(seed)
