"""I_predict_net (LPNet) — SE-ResNet brightness-ratio regressor.

Parity: reference basicsr/models/archs/LPNet_arch.py:86-134. Real
checkpoints exist (checkpoint/LPNet_{lolblur,lolv1}.pth, 418,555 params);
the parity test loads them and matches the predicted scalar to ~1e-5.
"""

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.ops import (
    conv2d, init_conv2d, linear, init_linear, batch_norm_inference,
    avg_pool2d, global_avg_pool, grayscale,
)
from fdn_tip2025_tpu.nn.se import se_block, init_se_block, _init_bn


def _layer_spec(c):
    """(in_channels, filters, num_blocks, stride) per conv2/3/4."""
    return [
        ("conv2", c, (c, c, 2 * c), 3, 1),
        ("conv3", 2 * c, (2 * c, 2 * c, 4 * c), 3, 2),
        ("conv4", 4 * c, (4 * c, 4 * c, 8 * c), 6, 6),
    ]


def init_ipredict(key, c=16):
    ks = iter(jax.random.split(key, 64))
    p = {
        "conv1": {"0": init_conv2d(next(ks), 7, 7, 3, c, bias=False),
                  "1": _init_bn(c)},
        "fc": {"0": init_linear(next(ks), 8 * c, 8 * c)},
        "fc2": {"0": init_linear(next(ks), 8 * c, 1)},
    }
    for name, cin, filters, num, stride in _layer_spec(c):
        layer = {"0": init_se_block(next(ks), cin, filters, stride=stride,
                                    is_1x1conv=True)}
        for i in range(1, num):
            layer[str(i)] = init_se_block(next(ks), filters[2], filters,
                                          stride=1, is_1x1conv=False)
        p[name] = layer
    return p


def ipredict_forward(params, x, use_ori_i=False, c=16):
    """x: (B, H, W, 3) in [0, 1]. Returns (B, 1) sigmoid ratio, or
    mean-gray/pred when use_ori_i (LPNet_arch.py:131-132)."""
    gray_mean = jnp.mean(grayscale(x), axis=(1, 2))  # (B, 1)

    y = conv2d(x, params["conv1"]["0"]["weight"], None, stride=2, padding=3)
    bn = params["conv1"]["1"]
    y = jax.nn.relu(batch_norm_inference(y, bn["weight"], bn["bias"],
                                         bn["running_mean"],
                                         bn["running_var"]))
    y = avg_pool2d(y, 3, 2, 1)
    for name, cin, filters, num, stride in _layer_spec(c):
        layer = params[name]
        y = se_block(layer["0"], y, stride=stride, is_1x1conv=True)
        for i in range(1, num):
            y = se_block(layer[str(i)], y, stride=1, is_1x1conv=False)
    y = global_avg_pool(y, keepdims=False)  # (B, 8c)
    y = linear(y, params["fc"]["0"]["weight"], params["fc"]["0"]["bias"])
    y = linear(y, params["fc2"]["0"]["weight"], params["fc2"]["0"]["bias"])
    y = jax.nn.sigmoid(y)
    if use_ori_i:
        return gray_mean / y
    return y
