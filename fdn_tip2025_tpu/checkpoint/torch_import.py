"""Bit-faithful torch .pth -> JAX pytree conversion.

Handles the reference checkpoint format ({'params': state_dict}, optional
'module.' DDP prefixes — base_model.py:191-222, 259-284) and layout
transposition:
  Conv2d        (O, I/g, kh, kw) -> HWIO (kh, kw, I/g, O)
  ConvTranspose (I, O, kh, kw)   -> spatially-flipped (kh, kw, I, O)
  Linear        (O, I)           -> (I, O)
  fft params    (C, 1, 1, 8, 5)  -> (8, 5, C)
  1-D tensors                    -> copied
BatchNorm num_batches_tracked buffers are dropped.

torch is only needed for reading .pth files (pickle), never for compute.
"""

import numpy as np
import jax.numpy as jnp

from fdn_tip2025_tpu.utils.pytree import flatten, unflatten


def load_pth_state_dict(path, param_key="params"):
    """Read a torch .pth into {name: np.ndarray} (CPU, no grad)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and param_key in obj:
        obj = obj[param_key]
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.endswith("num_batches_tracked"):
            continue
        out[k] = v.detach().numpy()
    return out


def _is_transposed_conv_path(path):
    # MAR's f2_up / f3_up are the only ConvTranspose2d layers in the family
    # (FDN_arch.py:194-195).
    return ".f2_up." in path or ".f3_up." in path or \
        path.startswith(("f2_up.", "f3_up."))


def _transform(name, torch_arr, target_shape):
    a = torch_arr
    # Linear weights are always (O, I) in torch and (I, O) here — transpose
    # even when square (fc 128x128 in LPNet would otherwise slip through the
    # shape-equality check untransposed).
    if a.ndim == 2 and a.T.shape == tuple(target_shape):
        return np.ascontiguousarray(a.T)
    if a.shape == tuple(target_shape):
        return a
    if a.ndim == 4:
        if _is_transposed_conv_path(name):
            t = a.transpose(2, 3, 0, 1)[::-1, ::-1]
            if t.shape == tuple(target_shape):
                return np.ascontiguousarray(t)
        t = a.transpose(2, 3, 1, 0)
        if t.shape == tuple(target_shape):
            return t
    if a.ndim == 5:
        t = a[:, 0, 0].transpose(1, 2, 0)
        if t.shape == tuple(target_shape):
            return t
    raise ValueError(
        f"cannot map {name}: torch {a.shape} -> target {tuple(target_shape)}")


def convert_state_dict(sd, target_tree, dtype=jnp.float32, strict=True):
    """Map a torch state dict onto an initialized target param tree.

    Leaf paths must match the torch names exactly (our trees are built to
    mirror them). Returns a new tree; raises on missing/extra keys when
    strict.
    """
    target_flat = flatten(target_tree)
    out = {}
    extra = []
    for name, arr in sd.items():
        if name not in target_flat:
            extra.append(name)
            continue
        out[name] = jnp.asarray(
            _transform(name, arr, target_flat[name].shape), dtype)
    missing = [k for k in target_flat if k not in out]
    if strict and (missing or extra):
        raise ValueError(
            f"state dict mismatch: missing={missing[:8]}({len(missing)}) "
            f"extra={extra[:8]}({len(extra)})")
    for k in missing:
        out[k] = target_flat[k]
    return unflatten(out)


def load_model_from_pth(path, target_tree, param_key="params", strict=True):
    sd = load_pth_state_dict(path, param_key=param_key)
    return convert_state_dict(sd, target_tree, strict=strict)
