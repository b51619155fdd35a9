"""Misc utilities.

Parity: reference basicsr/utils/misc.py — set_random_seed (:14-22),
mkdir_and_rename (archive existing dirs with a timestamp, :25-35),
scandir (:46-80), sizeof_fmt, check_resume path rewriting (:137-165,
adapted to native checkpoint dirs).
"""

import os
import random
import time

import numpy as np


def set_random_seed(seed):
    """Seed python/numpy; jax keys are explicit (jax.random.PRNGKey)."""
    random.seed(seed)
    np.random.seed(seed)
    return seed


def get_time_str():
    return time.strftime("%Y%m%d_%H%M%S", time.localtime())


def mkdir_and_rename(path):
    """mkdir; if it exists, archive it with a timestamp suffix first."""
    if os.path.exists(path):
        new_name = path + "_archived_" + get_time_str()
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


def scandir(dir_path, suffix=None, recursive=False, full_path=False):
    """Yield file paths under dir_path, optionally filtered by suffix."""
    root = dir_path

    def _scandir(dir_path):
        for entry in os.scandir(dir_path):
            if not entry.name.startswith(".") and entry.is_file():
                rel = entry.path if full_path else \
                    os.path.relpath(entry.path, root)
                if suffix is None or rel.endswith(suffix):
                    yield rel
            elif recursive and entry.is_dir():
                yield from _scandir(entry.path)

    return _scandir(dir_path)


def sizeof_fmt(size, suffix="B"):
    for unit in ("", "K", "M", "G", "T", "P", "E", "Z"):
        if abs(size) < 1024.0:
            return f"{size:3.1f} {unit}{suffix}"
        size /= 1024.0
    return f"{size:3.1f} Y{suffix}"


def check_resume(opt, resume_iter):
    """When resuming, point pretrain paths at the resumed iteration's
    network checkpoint (reference misc.py:137-165)."""
    path = opt.get("path", {})
    if path.get("resume_state") and path.get("pretrain_network_g"):
        path["pretrain_network_g"] = os.path.join(
            path["models"], f"net_g_{resume_iter}")
    return opt
