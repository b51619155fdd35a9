"""Optimizers: AdamW/Adam/SGD (optax) with torch-matching hyperparams and
the reference's hard gradient clip.

Parity: image_restoration_model.py:207-231 (optimizer factory; AdamW with
lr 1e-3, wd 1e-3, betas (0.9, 0.9) per FDN.yml:60-64) and the global-norm
clip at max_norm=0.01 (:501-503). Note torch clip_grad_norm_ clips the
TOTAL norm to 0.01, identical to optax.clip_by_global_norm.
"""

import optax


def build_optimizer(opt, schedule, use_grad_clip=True, clip_norm=0.01,
                    skip_nonfinite=True, max_consecutive_nonfinite=100):
    """opt: YAML optim_g section; schedule: step -> lr.

    skip_nonfinite (default ON; train.skip_nonfinite: false opts out)
    wraps the whole chain in optax.apply_if_finite: a step whose
    gradients contain inf/NaN applies NO update and leaves optimizer
    state untouched, instead of poisoning every weight permanently
    (torch's clip_grad_norm_ — and our clip — turn one non-finite
    gradient into a NaN scale for ALL parameters; the reference has no
    guard and would die the same way). Observed for real in round 5: a
    5k-iter AMP run at 128^2 NaN'd between iters 3150-3200 after a
    gradient spike through the phase-algebra backward (1/(2*sqrt(x))
    chains at the 1e-10 denormal-clamp floor), with training healthy on
    either side — tools/recipe_run.py artifact. Standard practice in
    production TPU trainers. The skip count is surfaced in the step aux
    (n_nonfinite_total) and after max_consecutive_nonfinite consecutive
    bad steps the guard stops masking so a structural NaN still fails
    loudly.
    """
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
    tx = optax.chain(*chain)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_nonfinite)
    return tx


def nonfinite_count(opt_state):
    """Total skipped-step count from an apply_if_finite-wrapped state
    (None when the guard is disabled)."""
    return getattr(opt_state, "total_notfinite", None)
