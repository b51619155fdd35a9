"""Logging + observability.

Parity: reference basicsr/utils/logger.py — MessageLogger line format
(epoch/iter/lr/ETA/losses, :28-91), TensorBoard scalars, root logger.
Deliberate fix (SURVEY.md §7 quirks): TB steps use the REAL iteration, not
the reference's normalized 10000*(iter/total) axis (logger.py:73-74).
"""

import datetime
import logging
import time


def get_root_logger(name="fdn_tpu", log_file=None, level=logging.INFO):
    logger = logging.getLogger(name)
    # check OWN handlers only: hasHandlers() also sees root handlers that
    # absl/jax install, which would leave this logger handler-less and
    # INFO lines swallowed by the root WARNING level.
    if logger.handlers:
        if log_file and not any(isinstance(h, logging.FileHandler)
                                for h in logger.handlers):
            fmt = logging.Formatter(
                "%(asctime)s %(levelname)s: %(message)s",
                "%Y-%m-%d %H:%M:%S")
            fh = logging.FileHandler(log_file, "a")
            fh.setFormatter(fmt)
            logger.addHandler(fh)
        return logger
    fmt = logging.Formatter(
        "%(asctime)s %(levelname)s: %(message)s", "%Y-%m-%d %H:%M:%S")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    logger.setLevel(level)
    if log_file:
        fh = logging.FileHandler(log_file, "a")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def init_tb_logger(log_dir):
    from tensorboardX import SummaryWriter
    return SummaryWriter(log_dir=log_dir)


def init_wandb_logger(opt):
    """wandb in TB-sync mode (reference logger.py:94-118): wandb mirrors
    the TensorBoard scalars, so no separate logging calls are needed.
    Import-gated — this offline image has no wandb; configs enable it via
    logger.wandb.project like the reference YAML schema."""
    try:
        import wandb
    except ImportError:
        get_root_logger().warning(
            "logger.wandb configured but wandb is not installed — skipped")
        return None
    wandb_opt = opt["logger"]["wandb"]
    resume_id = wandb_opt.get("resume_id")
    kwargs = dict(resume="allow", id=resume_id) if resume_id else {}
    wandb.init(project=wandb_opt["project"], name=opt["name"],
               config=opt, sync_tensorboard=True, **kwargs)
    get_root_logger().info(
        f"wandb logger initialized (project={wandb_opt['project']})")
    return wandb


class MessageLogger:
    def __init__(self, opt, start_iter=1, tb_logger=None):
        self.exp_name = opt["name"]
        self.interval = opt["logger"]["print_freq"]
        self.start_iter = start_iter
        self.max_iters = opt["train"]["total_iter"]
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    def __call__(self, log_vars):
        current_iter = log_vars.pop("iter")
        epoch = log_vars.pop("epoch", 0)
        lrs = log_vars.pop("lrs", [])
        message = (f"[{self.exp_name[:24]}..][epoch:{epoch:3d}, "
                   f"iter:{current_iter:8,d}, lr:(")
        message += ", ".join(f"{v:.3e}" for v in lrs) + ")] "

        if "time" in log_vars:
            iter_time = log_vars.pop("time")
            data_time = log_vars.pop("data_time", 0.0)
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / max(
                current_iter - self.start_iter + 1, 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(eta_sec)))
            message += (f"[eta: {eta_str}, time (data): "
                        f"{iter_time:.3f} ({data_time:.3f})] ")

        for k, v in log_vars.items():
            message += f"{k}: {v:.4e} "
            if self.tb_logger is not None:
                tag = f"losses/{k}" if k.startswith("l_") else k
                self.tb_logger.add_scalar(tag, float(v), current_iter)
        self.logger.info(message)
