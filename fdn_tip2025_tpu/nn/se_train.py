"""Training-mode SEBlock: batch-stat BatchNorm with running-stat updates.

torch BatchNorm2d(training=True): normalize by batch mean/var (biased),
update running stats with momentum 0.1 using the UNBIASED batch variance.
Returns (output, new_stats) where new_stats mirrors the params subtree.
"""

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.ops import conv2d, global_avg_pool

_MOMENTUM = 0.1


def bn_train(p, x):
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.var(x, axis=(0, 1, 2))
    n = x.shape[0] * x.shape[1] * x.shape[2]
    unbiased = var * n / max(n - 1, 1)
    y = (x - mean) / jnp.sqrt(var + 1e-5) * p["weight"] + p["bias"]
    new_stats = {
        "running_mean": (1 - _MOMENTUM) * p["running_mean"]
        + _MOMENTUM * mean,
        "running_var": (1 - _MOMENTUM) * p["running_var"]
        + _MOMENTUM * unbiased,
    }
    return y, new_stats


def se_block_train(params, x, stride=1, is_1x1conv=False):
    new = {}
    shortcut = x
    y = conv2d(x, params["conv1"]["0"]["weight"], None, stride=stride)
    y, s = bn_train(params["conv1"]["1"], y)
    new["conv1"] = {"1": s}
    y = jax.nn.relu(y)
    y = conv2d(y, params["conv2"]["0"]["weight"], None, padding=1)
    y, s = bn_train(params["conv2"]["1"], y)
    new["conv2"] = {"1": s}
    y = jax.nn.relu(y)
    y = conv2d(y, params["conv3"]["0"]["weight"], None)
    y, s = bn_train(params["conv3"]["1"], y)
    new["conv3"] = {"1": s}
    se = global_avg_pool(y)
    se = jax.nn.relu(conv2d(se, params["se"]["1"]["weight"],
                            params["se"]["1"]["bias"]))
    se = jax.nn.sigmoid(conv2d(se, params["se"]["3"]["weight"],
                               params["se"]["3"]["bias"]))
    y = y * se
    if is_1x1conv:
        shortcut = conv2d(shortcut, params["shortcut"]["0"]["weight"], None,
                          stride=stride)
        shortcut, s = bn_train(params["shortcut"]["1"], shortcut)
        new["shortcut"] = {"1": s}
    return jax.nn.relu(y + shortcut), new
