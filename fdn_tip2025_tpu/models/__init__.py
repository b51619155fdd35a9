"""Model families: MAR, FDformer, FDN (lolblur), FDN_lolv1, I_predict_net.

`create_model(name, key)` mirrors the reference's define_network registry
(basicsr/models/archs/__init__.py:43-46) with explicit construction instead
of dynamic class-name lookup.
"""

from fdn_tip2025_tpu.models.mar import init_mar, mar_forward
from fdn_tip2025_tpu.models.fdformer import init_fdformer, fdformer_forward
from fdn_tip2025_tpu.models.fdn import (
    init_fdn, fdn_forward, init_fdn_lolv1, fdn_lolv1_forward,
)
from fdn_tip2025_tpu.models.ipredict import (
    init_ipredict, ipredict_forward,
)

_REGISTRY = {}


def register(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def create_model(name, key, **kwargs):
    """Build (params, apply_fn) for a registered model name.

    Names match the reference YAML `network_g.type` values:
    'FDN', 'FDN_lolv1', 'MAR', 'I_predict_net'.
    """
    if name == "FDN":
        params = init_fdn(key, **kwargs)
        return params, fdn_forward
    if name == "FDN_lolv1":
        params = init_fdn_lolv1(key, **kwargs)
        return params, fdn_lolv1_forward
    if name == "MAR":
        params = init_mar(key, **kwargs)
        return params, mar_forward
    if name == "I_predict_net":
        params = init_ipredict(key, **kwargs)
        return params, ipredict_forward
    raise KeyError(f"unknown model: {name}")
