"""Training-mode I_predict_net forward (batch-stat BN + stat updates)."""

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.ops import (
    conv2d, linear, avg_pool2d, global_avg_pool, grayscale,
)
from fdn_tip2025_tpu.nn.se_train import bn_train, se_block_train
from fdn_tip2025_tpu.models.ipredict import _layer_spec


def ipredict_forward_train(params, x, c=16):
    """Returns (pred (B,1), new_bn_stats subtree)."""
    new = {}
    y = conv2d(x, params["conv1"]["0"]["weight"], None, stride=2, padding=3)
    y, s = bn_train(params["conv1"]["1"], y)
    new["conv1"] = {"1": s}
    y = jax.nn.relu(y)
    y = avg_pool2d(y, 3, 2, 1)
    for name, cin, filters, num, stride in _layer_spec(c):
        layer = params[name]
        lnew = {}
        y, s = se_block_train(layer["0"], y, stride=stride, is_1x1conv=True)
        lnew["0"] = s
        for i in range(1, num):
            y, s = se_block_train(layer[str(i)], y)
            lnew[str(i)] = s
        new[name] = lnew
    y = global_avg_pool(y, keepdims=False)
    y = linear(y, params["fc"]["0"]["weight"], params["fc"]["0"]["bias"])
    y = linear(y, params["fc2"]["0"]["weight"], params["fc2"]["0"]["bias"])
    return jax.nn.sigmoid(y), new


def merge_bn_stats(params, new_stats):
    """Fold updated running stats back into the param tree."""
    def merge(p, n):
        out = dict(p)
        for k, v in n.items():
            if isinstance(v, dict) and "running_mean" not in v:
                out[k] = merge(p[k], v)
            elif isinstance(v, dict):
                out[k] = {**p[k], **v}
        return out

    return merge(params, new_stats)
