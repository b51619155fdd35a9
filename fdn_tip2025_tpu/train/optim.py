"""Optimizers: AdamW/Adam/SGD (optax) with torch-matching hyperparams and
the reference's hard gradient clip.

Parity: image_restoration_model.py:207-231 (optimizer factory; AdamW with
lr 1e-3, wd 1e-3, betas (0.9, 0.9) per FDN.yml:60-64) and the global-norm
clip at max_norm=0.01 (:501-503). Note torch clip_grad_norm_ clips the
TOTAL norm to 0.01, identical to optax.clip_by_global_norm.
"""

import optax


def build_optimizer(opt, schedule, use_grad_clip=True, clip_norm=0.01):
    """opt: YAML optim_g section; schedule: step -> lr."""
    opt = dict(opt)
    kind = opt.pop("type", "AdamW")
    betas = tuple(opt.get("betas", (0.9, 0.999)))
    wd = float(opt.get("weight_decay", 0.0))

    if kind == "AdamW":
        core = optax.adamw(schedule, b1=betas[0], b2=betas[1],
                           weight_decay=wd)
    elif kind == "Adam":
        core = optax.adam(schedule, b1=betas[0], b2=betas[1])
    elif kind == "SGD":
        core = optax.sgd(schedule, momentum=opt.get("momentum", 0.0))
    else:
        raise ValueError(f"optimizer {kind} not supported")

    chain = []
    if use_grad_clip:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(core)
    return optax.chain(*chain)
