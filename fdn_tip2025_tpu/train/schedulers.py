"""LR schedules as pure functions step -> lr (optax-compatible).

Parity: reference basicsr/models/lr_scheduler.py — MultiStepRestartLR
(:6-46), LinearLR (:48-69), VibrateLR (:71-112), CosineAnnealingRestartLR
(:135-183); plus 'TrueCosineAnnealingLR' = torch CosineAnnealingLR
(base_model.py:94-98), the one every shipped config uses
(options/train/FDN.yml:66-68). Warmup ramp matches
base_model.py:161-183 (linear multiplier over warmup_iter).
"""

import math

import jax.numpy as jnp


def true_cosine_annealing(base_lr, t_max, eta_min=0.0):
    def lr(step):
        return eta_min + (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * step / t_max)) / 2

    return lr


def linear_lr(base_lr, total_iter):
    def lr(step):
        return base_lr * (1 - step / total_iter)

    return lr


def multistep_restart(base_lr, milestones, gamma=0.1, restarts=(0,),
                      restart_weights=(1,)):
    milestones = sorted(milestones)

    def lr(step):
        w = 1.0
        for r, rw in zip(restarts, restart_weights):
            w = jnp.where(step == r, rw, w)
        decay = jnp.asarray(0.0)
        for m in milestones:
            decay = decay + (step >= m)
        return base_lr * w * (gamma ** decay)

    return lr


def vibrate_lr(base_lr, total_iter):
    def lr(step):
        process = step / total_iter
        f = jnp.where(process < 3 / 8, 1 - process * 8 / 3,
                      jnp.where(process < 5 / 8, 0.2, 0.1))
        T = total_iter // 80
        Th = T // 2
        t = step % T
        f2 = jnp.where(t >= Th, 2 - t / Th, t / Th)
        weight = f * f2
        weight = jnp.where(step < Th, jnp.maximum(0.1, weight), weight)
        return base_lr * weight

    return lr


def cosine_annealing_restart(base_lr, periods, restart_weights=(1,),
                             eta_min=0.0):
    cumulative = [sum(periods[: i + 1]) for i in range(len(periods))]

    def lr(step):
        out = None
        for idx, cum in enumerate(cumulative):
            start = 0 if idx == 0 else cumulative[idx - 1]
            w = restart_weights[idx]
            val = eta_min + w * 0.5 * (base_lr - eta_min) * (
                1 + jnp.cos(jnp.pi * ((step - start) / periods[idx])))
            out = val if out is None else jnp.where(step > start, val, out)
        return out

    return lr


def with_warmup(schedule, warmup_iter, base_lr):
    """Linear warmup multiplier like base_model.py:171-183."""
    if warmup_iter <= 0:
        return schedule

    def lr(step):
        warm = base_lr * step / warmup_iter
        return jnp.where(step < warmup_iter, warm, schedule(step))

    return lr


def build_scheduler(opt, base_lr, total_iter):
    """opt: YAML scheduler section ({'type': ..., ...})."""
    opt = dict(opt)
    kind = opt.pop("type")
    if kind == "TrueCosineAnnealingLR":
        return true_cosine_annealing(base_lr, opt.get("T_max", total_iter),
                                     opt.get("eta_min", 0.0))
    if kind == "CosineAnnealingRestartLR":
        return cosine_annealing_restart(base_lr, opt["periods"],
                                        opt.get("restart_weights", (1,)),
                                        opt.get("eta_min", 0.0))
    if kind == "LinearLR":
        return linear_lr(base_lr, opt.get("total_iter", total_iter))
    if kind == "VibrateLR":
        return vibrate_lr(base_lr, opt.get("total_iter", total_iter))
    if kind == "MultiStepLR" or kind == "MultiStepRestartLR":
        return multistep_restart(base_lr, opt["milestones"],
                                 opt.get("gamma", 0.1),
                                 opt.get("restarts", (0,)),
                                 opt.get("restart_weights", (1,)))
    raise ValueError(f"unknown scheduler {kind}")
