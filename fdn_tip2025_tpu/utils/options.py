"""YAML config system.

Parity: reference basicsr/utils/options.py — ordered parse (:6-43),
experiment dir expansion experiments/<name>/{models,training_states,
visualization} (:67-76), debug-mode freq overrides (:79-83). Differences
(deliberate, SURVEY.md §5 "config/flag system"): model behavior that the
reference toggles via constructor default flags (img_only/use3stage soup,
image_restoration_model.py:107-129) is explicit config here.
"""

import os

import yaml


def parse(opt_path, is_train=True, root=None):
    with open(opt_path, "r") as f:
        opt = yaml.safe_load(f)
    opt["is_train"] = is_train
    opt.setdefault("scale", 1)
    opt.setdefault("manual_seed", 0)

    for phase, dataset in (opt.get("datasets") or {}).items():
        phase_key = phase.split("_")[0]
        dataset["phase"] = "train" if phase == "train" else "val"
        dataset["scale"] = opt["scale"]

    root = root or os.getcwd()
    name = opt["name"]
    if is_train:
        exp_root = os.path.join(root, "experiments", name)
        opt["path"] = {**(opt.get("path") or {}),
                       "experiments_root": exp_root,
                       "models": os.path.join(exp_root, "models"),
                       "training_states": os.path.join(exp_root,
                                                       "training_states"),
                       "log": exp_root,
                       "visualization": os.path.join(exp_root,
                                                     "visualization")}
        if "debug" in name:
            val = opt.setdefault("val", {})
            val["val_freq"] = 8
            logger = opt.setdefault("logger", {})
            logger["print_freq"] = 1
            logger["save_checkpoint_freq"] = 8
    else:
        results_root = os.path.join(root, "results", name)
        opt["path"] = {**(opt.get("path") or {}),
                       "results_root": results_root,
                       "log": results_root,
                       "visualization": os.path.join(results_root,
                                                     "visualization")}
    return opt


def make_exp_dirs(opt):
    for key in ("experiments_root", "models", "training_states",
                "visualization", "results_root"):
        p = opt["path"].get(key)
        if p:
            os.makedirs(p, exist_ok=True)


def dict2str(opt, indent=1):
    msg = ""
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * indent * 2 + f"{k}:\n" + dict2str(v, indent + 1)
        else:
            msg += " " * indent * 2 + f"{k}: {v}\n"
    return msg
