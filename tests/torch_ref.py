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
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms


def import_ref_arch(name="FDN_arch"):
    """Import a reference arch module (e.g. FDN_arch, LPNet_arch)."""
    _install_torchvision_stub()
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
