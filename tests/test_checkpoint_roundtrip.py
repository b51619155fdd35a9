"""Checkpoint interop: torch .pth -> pytree -> torch .pth roundtrips."""

import numpy as np
import torch

import jax

from fdn_tip2025_tpu.checkpoint import convert_state_dict
from fdn_tip2025_tpu.checkpoint.manager import (
    export_torch_pth, save_network, load_network, find_latest_state,
)
from tests.torch_ref import import_ref_arch, seed_all

ARCH = import_ref_arch("FDN_arch")
KEY = jax.random.PRNGKey(0)


def sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()
            if not k.endswith("num_batches_tracked")}


def test_export_pth_loads_strict_in_reference(tmp_path):
    """Our exported .pth must load strict=True into the reference MAR."""
    from fdn_tip2025_tpu.models import init_mar

    seed_all()
    ref = ARCH.MAR(use_ratio=True)
    params = convert_state_dict(sd(ref), init_mar(KEY))
    path = str(tmp_path / "mar_export.pth")
    export_torch_pth(params, path)
    ref2 = ARCH.MAR(use_ratio=True)
    state = torch.load(path, map_location="cpu", weights_only=True)
    ref2.load_state_dict(state["params"], strict=True)  # raises on mismatch
    for (k1, v1), (k2, v2) in zip(ref.state_dict().items(),
                                  ref2.state_dict().items()):
        assert k1 == k2
        np.testing.assert_allclose(v1.numpy(), v2.numpy(), atol=1e-6,
                                   err_msg=k1)


def test_native_checkpoint_roundtrip(tmp_path):
    from fdn_tip2025_tpu.models import init_ipredict
    from fdn_tip2025_tpu.utils.pytree import flatten

    params = init_ipredict(KEY)
    save_network(str(tmp_path), params, 123)
    back = load_network(str(tmp_path / "net_g_123"))
    fa, fb = flatten(params), flatten(back)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]))


def test_find_latest_state(tmp_path):
    (tmp_path / "100.state").mkdir()
    (tmp_path / "5000.state").mkdir()
    (tmp_path / "junk").mkdir()
    assert find_latest_state(str(tmp_path)).endswith("5000.state")
    assert find_latest_state(str(tmp_path / "nope")) is None


def test_fdn_export_import_roundtrip(tmp_path):
    """FDN (incl. 5-D fft/ffta/fftp params) exports to .pth and re-imports
    bit-identically."""
    from fdn_tip2025_tpu.models import init_fdn
    from fdn_tip2025_tpu.checkpoint import load_model_from_pth
    from fdn_tip2025_tpu.utils.pytree import flatten

    params = init_fdn(KEY)
    path = str(tmp_path / "fdn_export.pth")
    export_torch_pth(params, path)
    back = load_model_from_pth(path, init_fdn(jax.random.PRNGKey(7)))
    fa, fb = flatten(params), flatten(back)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   atol=1e-6, err_msg=k)
