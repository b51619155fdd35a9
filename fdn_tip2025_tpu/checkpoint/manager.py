"""Native checkpointing (orbax) + auto-resume.

Parity: reference base_model.py — save_network (:191-222) /
save_training_state (:286-309) / resume_training (:311-326), and the
auto-resume scan of experiments/<name>/training_states in
train_ir.py:174-197. Two artifacts per save, like the reference:
  models/net_g_<iter>          — model params only (portable)
  training_states/<iter>       — params + optimizer state + step
Deliberate fix (SURVEY.md §7 quirks): loading is strict by default
(reference's load_network forces strict=False at base_model.py:284).
"""

import os
import re

import orbax.checkpoint as ocp


def _ckptr():
    return ocp.PyTreeCheckpointer()


def save_network(path_root, params, current_iter):
    path = os.path.join(path_root, f"net_g_{current_iter}")
    _ckptr().save(os.path.abspath(path), params, force=True)
    return path


def load_network(path):
    return _ckptr().restore(os.path.abspath(path))


def save_training_state(state_root, trainable, frozen, opt_state, step,
                        epoch=0, bn_stats=None):
    state = {"trainable": trainable, "frozen": frozen,
             "opt_state": opt_state,
             "meta": {"step": step, "epoch": epoch}}
    path = os.path.join(state_root, f"{step}.state")
    _ckptr().save(os.path.abspath(path), state, force=True)
    return path


def load_training_state(path, template=None):
    if template is not None:
        return _ckptr().restore(os.path.abspath(path),
                                args=ocp.args.PyTreeRestore(template))
    return _ckptr().restore(os.path.abspath(path))


def find_latest_state(state_root):
    """Highest-iteration <iter>.state dir, or None (train_ir.py:174-186)."""
    if not os.path.isdir(state_root):
        return None
    best, best_iter = None, -1
    for name in os.listdir(state_root):
        m = re.fullmatch(r"(\d+)\.state", name)
        if m and int(m.group(1)) > best_iter:
            best_iter = int(m.group(1))
            best = os.path.join(state_root, name)
    return best


def export_torch_pth(params, path, param_key="params"):
    """Write params back out as a reference-compatible torch .pth
    (inverse of checkpoint.torch_import) so reference users can consume
    checkpoints trained here."""
    import numpy as np
    import torch

    from fdn_tip2025_tpu.utils.pytree import flatten
    from fdn_tip2025_tpu.checkpoint.torch_import import \
        _is_transposed_conv_path

    sd = {}
    for name, arr in flatten(params).items():
        a = np.asarray(arr)
        if a.ndim == 4 and name.endswith("weight"):
            if _is_transposed_conv_path(name):
                a = a[::-1, ::-1].transpose(2, 3, 0, 1)  # -> (I, O, kh, kw)
            else:
                a = a.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        elif a.ndim == 2 and name.endswith("weight"):
            a = a.T
        elif a.ndim == 3 and name.endswith(("fft", "ffta", "fftp")):
            a = a.transpose(2, 0, 1)[:, None, None]  # -> (C,1,1,8,5)
        sd[name] = torch.from_numpy(np.ascontiguousarray(a))
    torch.save({param_key: sd}, path)
    return path
