#!/usr/bin/env python
"""Training entry point — equivalent of the reference's
basicsr/train_ir.py driven by fdn.sh / MAR.sh / train_lpnet.sh:
  python tools/train.py -opt configs/fdn_lolblur.yml

Single-process SPMD replaces torch.distributed.launch: the batch in the
config is the GLOBAL batch, sharded over all local devices via the mesh
(pass --num-devices to restrict). Auto-resume scans
experiments/<name>/training_states like train_ir.py:174-197.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fdn_tip2025_tpu.utils.platform import force_platform  # noqa: E402

force_platform()  # FDN_DEVICE=cpu to force CPU (sitecustomize pins TPU)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-opt", required=True, help="path to YAML config")
    ap.add_argument("--num-devices", type=int, default=None)
    ap.add_argument("--max-iters", type=int, default=None,
                    help="override total_iter (smoke runs)")
    ap.add_argument("--vgg-weights", default=None,
                    help="torchvision vgg19 .pth for the perceptual loss")
    args = ap.parse_args()

    from fdn_tip2025_tpu.utils.options import parse, make_exp_dirs
    from fdn_tip2025_tpu.utils.logger import (
        get_root_logger, MessageLogger, init_tb_logger,
    )
    from fdn_tip2025_tpu.data.paired_dataset import PairedImageDataset
    from fdn_tip2025_tpu.data.sampler import EnlargedSampler
    from fdn_tip2025_tpu.data.loader import BatchLoader
    from fdn_tip2025_tpu.train.engine import create_trainer
    from fdn_tip2025_tpu.train.validation import validate
    from fdn_tip2025_tpu.parallel.mesh import make_mesh
    from fdn_tip2025_tpu.checkpoint.manager import (
        save_network, save_training_state, find_latest_state,
        load_training_state,
    )

    opt = parse(args.opt, is_train=True)
    if args.max_iters:
        opt["train"]["total_iter"] = args.max_iters
    make_exp_dirs(opt)
    logger = get_root_logger(
        log_file=os.path.join(opt["path"]["log"], "train.log"))
    tb = None
    if opt.get("logger", {}).get("use_tb_logger"):
        # wandb first, in TB-sync mode (train_ir.py:91-96 ordering)
        if (opt["logger"].get("wandb") or {}).get("project"):
            from fdn_tip2025_tpu.utils.logger import init_wandb_logger
            init_wandb_logger(opt)
        tb = init_tb_logger(os.path.join(opt["path"]["log"], "tb"))

    mesh = make_mesh(args.num_devices)
    n_dev = mesh.devices.size
    logger.info(f"mesh: {n_dev} devices ({mesh.devices.ravel()[0].platform})")

    path_opt = opt.get("path", {}) or {}

    vgg_path = args.vgg_weights or path_opt.get("vgg_weights")
    vgg_params = None
    if vgg_path and os.path.exists(vgg_path):
        from fdn_tip2025_tpu.train.perceptual import load_vgg19_params
        vgg_params = load_vgg19_params(vgg_path)
        logger.info("perceptual loss: VGG19 weights loaded")
    else:
        logger.warning("perceptual loss: DISABLED (no VGG19 weights) — "
                       "objective deviates from the reference recipe")

    # frozen-MAR weights for FDN (reference loads fourier_gamma.pth inside
    # FDN.__init__, FDN_arch.py:860-862 — here it is explicit config)
    kwargs = {}
    if opt["model_type"] == "ImageRestorationModel":
        mar_path = path_opt.get("pretrain_mar")
        if mar_path:
            kwargs["mar_params"] = _load_ckpt(
                mar_path, template_kind="mar",
                strict=path_opt.get("strict_load_g", True))
            logger.info(f"frozen MAR weights: {mar_path}")
        else:
            logger.warning(
                "path.pretrain_mar not set — FDN will train against a "
                "RANDOMLY-INITIALIZED frozen MAR (the reference 3-stage "
                "recipe pretrains MAR first)")

    trainer = create_trainer(opt, mesh=mesh, vgg_params=vgg_params,
                             **kwargs)

    # pretrain_network_g: warm-start full model params (check_resume
    # semantics, misc.py:137-165: an explicit resume_state supersedes it)
    pretrain_g = path_opt.get("pretrain_network_g")
    if pretrain_g and not path_opt.get("resume_state"):
        trainer.load_params(
            _load_ckpt(pretrain_g, template_kind=opt["model_type"],
                       strict=path_opt.get("strict_load_g", True),
                       trainer=trainer),
            strict=path_opt.get("strict_load_g", True))
        logger.info(f"pretrain_network_g loaded: {pretrain_g}")

    # data
    ds_opt = opt["datasets"]["train"]
    dataset = PairedImageDataset(ds_opt)
    global_batch = int(ds_opt.get("batch_size_per_gpu", 4)) * \
        int(opt.get("num_gpu", n_dev))
    # round to a multiple of the mesh size for even sharding
    global_batch = max(n_dev, global_batch - global_batch % n_dev)
    sampler = EnlargedSampler(len(dataset),
                              ds_opt.get("dataset_enlarge_ratio", 1),
                              seed=opt["manual_seed"])
    loader = BatchLoader(dataset, global_batch, sampler=sampler,
                         num_workers=int(ds_opt.get("num_worker_per_gpu",
                                                    2)),
                         seed=opt["manual_seed"], loop=True)
    logger.info(f"dataset: {len(dataset)} pairs, global batch "
                f"{global_batch}")

    # resume: explicit path.resume_state wins, else auto-scan
    # (train_ir.py:174-197)
    state_path = path_opt.get("resume_state") or \
        find_latest_state(opt["path"]["training_states"])
    if state_path:
        # restore against the live trainer structures: without the
        # template, orbax returns the opt_state as plain dicts and the
        # first optax update crashes (NamedTuple structure lost)
        state = load_training_state(state_path, template={
            "trainable": trainer.trainable, "frozen": trainer.frozen,
            "opt_state": trainer.opt_state,
            "meta": {"step": 0, "epoch": 0}})
        trainer.trainable = state["trainable"]
        trainer.frozen = state["frozen"]
        trainer.opt_state = state["opt_state"]
        trainer.step = int(state["meta"]["step"])
        logger.info(f"resumed from {state_path} @ iter {trainer.step}")

    total_iter = int(opt["train"]["total_iter"])
    msg_logger = MessageLogger(opt, trainer.step, tb)
    val_freq = int(opt.get("val", {}).get("val_freq", 5000))
    save_freq = int(opt.get("logger", {}).get("save_checkpoint_freq", 5000))
    print_freq = int(opt.get("logger", {}).get("print_freq", 100))

    # H2D double-buffering: device_put the next batches (batch-sharded)
    # while the current step computes — the CUDAPrefetcher analog
    # (prefetch_dataloader.py:84-126).
    from fdn_tip2025_tpu.data.loader import prefetch_to_device
    from fdn_tip2025_tpu.parallel.mesh import batch_sharding
    batches = prefetch_to_device(loader, sharding=batch_sharding(mesh))

    # Preemption-safe training: TPU workers get SIGTERM'd (spot/
    # maintenance); checkpoint at the next step boundary and exit 0 so
    # the auto-resume scan above continues seamlessly on relaunch. The
    # reference's story is crash -> lose up to save_freq iters
    # (train_ir.py:174-197 resume only); this bounds the loss to one step.
    import signal

    preempted = []

    def _on_term(signum, frame):
        preempted.append(signum)

    prev_handler = signal.signal(signal.SIGTERM, _on_term)

    data_t = iter_t = time.time()
    for batch in batches:
        if trainer.step >= total_iter:
            break
        if preempted:
            save_network(opt["path"]["models"], trainer.params,
                         trainer.step)
            save_training_state(opt["path"]["training_states"],
                                trainer.trainable, trainer.frozen,
                                trainer.opt_state, trainer.step)
            logger.info(f"SIGTERM: preemption checkpoint @ "
                        f"{trainer.step}, exiting for resume")
            signal.signal(signal.SIGTERM, prev_handler)
            return
        data_time = time.time() - data_t
        aux = trainer.train_step(batch)
        iter_time = time.time() - iter_t
        iter_t = data_t = time.time()
        step = trainer.step
        if step % print_freq == 0:
            logs = {"iter": step, "epoch": loader.epoch,
                    "lrs": [trainer.current_lr()],
                    "time": iter_time, "data_time": data_time}
            logs.update({k: float(v) for k, v in aux.items()})
            msg_logger(logs)
        if step % save_freq == 0:
            save_network(opt["path"]["models"], trainer.params, step)
            save_training_state(opt["path"]["training_states"],
                                trainer.trainable, trainer.frozen,
                                trainer.opt_state, step)
            logger.info(f"checkpoint @ {step}")
        if step % val_freq == 0:
            # cross-job validation mutex (train_ir_gx.py:322-406 protocol:
            # jobs sharing an accelerator take turns on memory-heavy
            # validation); enabled via val.share_lock: <lockfile path>
            lock_path = opt.get("val", {}).get("share_lock")
            if lock_path:
                from fdn_tip2025_tpu.utils.coordination import FileLock
                with FileLock(lock_path):
                    for phase in opt.get("datasets", {}):
                        if phase.startswith("val"):
                            _run_val(opt, trainer, logger, tb, step,
                                     phase=phase)
            else:
                # every dataset phase named val* runs (train_ir.py:147-158
                # val_tiny multi-phase protocol)
                for phase in opt.get("datasets", {}):
                    if phase.startswith("val"):
                        _run_val(opt, trainer, logger, tb, step,
                                 phase=phase)

    save_network(opt["path"]["models"], trainer.params, trainer.step)
    save_training_state(opt["path"]["training_states"], trainer.trainable,
                        trainer.frozen, trainer.opt_state, trainer.step)
    logger.info(f"training done @ iter {trainer.step}")


def _load_ckpt(path, template_kind, strict=True, trainer=None):
    """Load a native checkpoint dir or torch .pth into the right param
    template. For .pth the template provides target shapes/layout."""
    from fdn_tip2025_tpu.checkpoint.manager import load_network
    from fdn_tip2025_tpu.checkpoint import load_model_from_pth

    if not path.endswith(".pth"):
        return load_network(path)

    import jax

    if template_kind == "mar":
        from fdn_tip2025_tpu.models import init_mar
        template = init_mar(jax.random.PRNGKey(0))
    elif trainer is not None:
        template = trainer.params
    else:
        raise ValueError(f"no template for {template_kind}")
    return load_model_from_pth(path, template, strict=strict)


def _run_val(opt, trainer, logger, tb, step, phase="val"):
    from fdn_tip2025_tpu.data.paired_dataset import PairedImageDataset
    from fdn_tip2025_tpu.train.validation import validate
    from fdn_tip2025_tpu.train.infer_adapters import (
        make_predict_fn, lpnet_ratio_validation,
    )

    val_opt = opt.get("val", {}) or {}
    val_ds = PairedImageDataset(opt["datasets"][phase])

    if opt["model_type"] == "ImageRestorationModel_ipred":
        # reference _ipred validation restores through a frozen full FDN
        # (model_fft, image_restoration_model.py:1488-1499,1949-1957) —
        # config path.pretrain_network_fft replaces its hardcoded path.
        fft_path = (opt.get("path", {}) or {}).get("pretrain_network_fft")
        if not fft_path:
            res = lpnet_ratio_validation(trainer, val_ds,
                                         max_images=val_opt.get(
                                             "max_images"))
            logger.info(
                f"validation[{phase}] @ {step}: ratio_l1 "
                f"{res['ratio_l1']:.4f} (no path.pretrain_network_fft — "
                "restored-image metrics skipped)")
            if tb:
                tb.add_scalar(f"metrics/m_ratio_l1_{phase}",
                              res["ratio_l1"], step)
            return
        if not hasattr(trainer, "_fdn_val_params"):
            import jax
            from fdn_tip2025_tpu.models import init_fdn
            from fdn_tip2025_tpu.checkpoint import load_model_from_pth
            from fdn_tip2025_tpu.checkpoint.manager import load_network
            trainer._fdn_val_params = (
                load_model_from_pth(fft_path,
                                    init_fdn(jax.random.PRNGKey(0)))
                if fft_path.endswith(".pth") else load_network(fft_path))
        predict = make_predict_fn(opt["model_type"], trainer,
                                  val_opt=val_opt,
                                  fdn_params=trainer._fdn_val_params)
    else:
        predict = make_predict_fn(opt["model_type"], trainer,
                                  val_opt=val_opt)
    metrics_opt = val_opt.get("metrics", {})
    save_dir = os.path.join(opt["path"]["visualization"],
                            f"iter_{step}_{phase}") \
        if opt.get("val", {}).get("save_img") else None
    # batched validation (val.batch_size, default = mesh size when >1):
    # same-shape val images stack into one forward sharded over the
    # training mesh — the reference's per-rank val image sharding
    # (image_restoration_model.py:728-731)
    mesh = getattr(trainer, "mesh", None)
    n_dev = mesh.devices.size if mesh is not None else 1
    batch = int(val_opt.get("batch_size", 0)) or (n_dev if n_dev > 1
                                                  else 1)
    res = validate(predict, val_ds, metrics_opt, save_dir=save_dir,
                   max_images=opt.get("val", {}).get("max_images"),
                   predict_batch_fn=getattr(predict, "batch", None)
                   if batch > 1 else None, batch_size=batch)
    msg = ", ".join(f"{k}: {v:.4f}" for k, v in res.items())
    logger.info(f"validation[{phase}] @ {step}: {msg}")
    if tb:
        for k, v in res.items():
            tb.add_scalar(f"metrics/m_{k}_{phase}" if phase != "val"
                          else f"metrics/m_{k}", v, step)


if __name__ == "__main__":
    main()
