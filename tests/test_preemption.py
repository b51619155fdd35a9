"""Preemption-safe training: SIGTERM -> checkpoint at the step boundary
-> exit 0 -> auto-resume on relaunch (tools/train.py).

The reference's failure story is crash -> relaunch -> resume at the last
save_freq checkpoint (train_ir.py:174-197); here a SIGTERM (TPU spot /
maintenance preemption) bounds the loss to at most one step.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_fixture(root, rng):
    import cv2

    for sub in ("lq", "gt"):
        os.makedirs(os.path.join(root, sub, "0001"), exist_ok=True)
    for i in range(4):
        img = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "lq", "0001", f"{i:04d}.png"), img)
        cv2.imwrite(os.path.join(root, "gt", "0001", f"{i:04d}.png"),
                    np.clip(img.astype(np.int32) * 3, 0,
                            255).astype(np.uint8))


def _config(root):
    return {
        "name": "preempt_smoke", "model_type":
        "ImageRestorationModel_ipretrain", "scale": 1, "num_gpu": 1,
        "manual_seed": 7, "use_ratio": True,
        "datasets": {"train": {
            "name": "t", "type": "PairedImageDataset",
            "dataroot_gt": os.path.join(root, "gt", "*", "*.png"),
            "dataroot_lq": os.path.join(root, "lq", "*", "*.png"),
            "gt_size": 32, "use_flip": True, "use_rot": True,
            "batch_size_per_gpu": 2, "num_worker_per_gpu": 2,
            "dataset_enlarge_ratio": 1}},
        "network_g": {"type": "MAR"},
        "path": {"pretrain_network_g": None, "resume_state": None},
        "train": {
            "optim_g": {"type": "AdamW", "lr": 1e-4,
                        "weight_decay": 0.0, "betas": [0.9, 0.9]},
            "scheduler": {"type": "TrueCosineAnnealingLR",
                          "T_max": 10000, "eta_min": 1e-7},
            "total_iter": 10000, "warmup_iter": -1},
        # save_freq huge: the only mid-run checkpoint is the preemption one
        "logger": {"print_freq": 1, "save_checkpoint_freq": 1e6,
                   "use_tb_logger": False},
        "val": {"val_freq": 1e6},
    }


@pytest.mark.slow
def test_sigterm_checkpoints_and_resumes(tmp_path, rng):
    import yaml

    _write_fixture(str(tmp_path / "data"), rng)
    cfg = str(tmp_path / "cfg.yml")
    yaml.safe_dump(_config(str(tmp_path / "data")), open(cfg, "w"))
    env = dict(os.environ, FDN_DEVICE="cpu", FDN_NATIVE_LOADER="0")
    env.pop("JAX_PLATFORMS", None)

    def launch():
        return subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "train.py"),
             "-opt", cfg],
            cwd=str(tmp_path), env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)

    proc = launch()
    deadline = time.time() + 600
    saw_iter = False
    try:
        for line in proc.stdout:
            if time.time() > deadline:
                pytest.fail("no training iteration within 600s")
            if "iter:" in line and "lr:" in line:
                saw_iter = True
                proc.send_signal(signal.SIGTERM)
                break
        assert saw_iter, "train loop never logged an iteration"
        out = proc.stdout.read()
        rc = proc.wait(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rc == 0, out[-2000:]
    assert "preemption checkpoint" in out, out[-2000:]

    states = os.path.join(str(tmp_path), "experiments", "preempt_smoke",
                          "training_states")
    assert os.path.isdir(states) and os.listdir(states), \
        "no training state saved on SIGTERM"

    # relaunch: auto-resume scan must pick the preemption state, AND a
    # post-resume step must actually run — restoring the optimizer state
    # without its optax NamedTuple structure crashes on the first
    # tx.update (caught live: orbax returns plain dicts unless restored
    # against a template)
    proc2 = launch()
    try:
        resumed = stepped = False
        for line in proc2.stdout:
            if "resumed from" in line:
                resumed = True
            if resumed and "iter:" in line and "lr:" in line:
                stepped = True
                proc2.send_signal(signal.SIGTERM)
                break
        assert resumed, "relaunch did not auto-resume"
        assert stepped, "no train step completed after resume"
        proc2.wait(timeout=180)
    finally:
        if proc2.poll() is None:
            proc2.kill()
