"""SEBlock — squeeze-excitation ResNet block for I_predict_net (LPNet).

Parity: reference basicsr/models/archs/LPNet_arch.py:42-81. Inference-mode
BatchNorm (running stats from checkpoints); the training engine uses batch
stats via the `train`/mutable-stats path in models/ipredict.py.
"""

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.ops import (
    conv2d, init_conv2d, batch_norm_inference, global_avg_pool,
)


def _init_bn(c):
    return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))}


def init_se_block(key, in_channels, filters, stride=1, is_1x1conv=False):
    f1, f2, f3 = filters
    ks = jax.random.split(key, 6)
    p = {
        "conv1": {"0": init_conv2d(ks[0], 1, 1, in_channels, f1, bias=False),
                  "1": _init_bn(f1)},
        "conv2": {"0": init_conv2d(ks[1], 3, 3, f1, f2, bias=False),
                  "1": _init_bn(f2)},
        "conv3": {"0": init_conv2d(ks[2], 1, 1, f2, f3, bias=False),
                  "1": _init_bn(f3)},
        "se": {"1": init_conv2d(ks[3], 1, 1, f3, f3 // 16),
               "3": init_conv2d(ks[4], 1, 1, f3 // 16, f3)},
    }
    if is_1x1conv:
        p["shortcut"] = {"0": init_conv2d(ks[5], 1, 1, in_channels, f3,
                                          bias=False),
                         "1": _init_bn(f3)}
    return p


def _bn(p, x):
    return batch_norm_inference(x, p["weight"], p["bias"],
                                p["running_mean"], p["running_var"])


def se_block(params, x, stride=1, is_1x1conv=False):
    shortcut = x
    y = jax.nn.relu(_bn(params["conv1"]["1"],
                        conv2d(x, params["conv1"]["0"]["weight"], None,
                               stride=stride)))
    y = jax.nn.relu(_bn(params["conv2"]["1"],
                        conv2d(y, params["conv2"]["0"]["weight"], None,
                               padding=1)))
    y = _bn(params["conv3"]["1"],
            conv2d(y, params["conv3"]["0"]["weight"], None))
    se = global_avg_pool(y)
    se = jax.nn.relu(conv2d(se, params["se"]["1"]["weight"],
                            params["se"]["1"]["bias"]))
    se = jax.nn.sigmoid(conv2d(se, params["se"]["3"]["weight"],
                               params["se"]["3"]["bias"]))
    y = y * se
    if is_1x1conv:
        shortcut = _bn(params["shortcut"]["1"],
                       conv2d(shortcut, params["shortcut"]["0"]["weight"],
                              None, stride=stride))
    return jax.nn.relu(y + shortcut)
