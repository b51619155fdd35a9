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
    tb = init_tb_logger(os.path.join(opt["path"]["log"], "tb")) \
        if opt.get("logger", {}).get("use_tb_logger") else None

    mesh = make_mesh(args.num_devices)
    n_dev = mesh.devices.size
    logger.info(f"mesh: {n_dev} devices ({mesh.devices.ravel()[0].platform})")

    vgg_params = None
    if args.vgg_weights and os.path.exists(args.vgg_weights):
        from fdn_tip2025_tpu.train.perceptual import load_vgg19_params
        vgg_params = load_vgg19_params(args.vgg_weights)
        logger.info("perceptual loss: VGG19 weights loaded")
    else:
        logger.info("perceptual loss: DISABLED (no VGG19 weights)")

    trainer = create_trainer(opt, mesh=mesh, vgg_params=vgg_params)

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

    # auto-resume
    state_path = find_latest_state(opt["path"]["training_states"])
    if state_path:
        state = load_training_state(state_path)
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

    data_t = iter_t = time.time()
    for batch in loader:
        if trainer.step >= total_iter:
            break
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
        if step % val_freq == 0 and "val" in opt.get("datasets", {}):
            _run_val(opt, trainer, logger, tb, step)

    save_network(opt["path"]["models"], trainer.params, trainer.step)
    save_training_state(opt["path"]["training_states"], trainer.trainable,
                        trainer.frozen, trainer.opt_state, trainer.step)
    logger.info(f"training done @ iter {trainer.step}")


def _run_val(opt, trainer, logger, tb, step):
    from fdn_tip2025_tpu.data.paired_dataset import PairedImageDataset
    from fdn_tip2025_tpu.train.validation import validate
    from fdn_tip2025_tpu.train.infer_adapters import make_predict_fn

    val_ds = PairedImageDataset(opt["datasets"]["val"])
    predict = make_predict_fn(opt["model_type"], trainer)
    metrics_opt = opt.get("val", {}).get("metrics", {})
    save_dir = os.path.join(opt["path"]["visualization"], f"iter_{step}") \
        if opt.get("val", {}).get("save_img") else None
    res = validate(predict, val_ds, metrics_opt, save_dir=save_dir,
                   max_images=opt.get("val", {}).get("max_images"))
    msg = ", ".join(f"{k}: {v:.4f}" for k, v in res.items())
    logger.info(f"validation @ {step}: {msg}")
    if tb:
        for k, v in res.items():
            tb.add_scalar(f"metrics/m_{k}", v, step)


if __name__ == "__main__":
    main()
