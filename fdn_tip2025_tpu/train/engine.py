"""Training engine: jitted SPMD train steps for the three model families.

Replaces the reference's model-wrapper classes
(basicsr/models/image_restoration_model.py):
  * FDNTrainer   ~ ImageRestorationModel (:104-940, active use3stage branch
    :477-504): L1 + 0.1*FFT + 0.01*VGG-perceptual on the restored image,
    ratio = mean(gray(lq)) / mean(gray(gt)) (:357-362), frozen MAR,
    grad-clip global-norm 0.01, AdamW + cosine.
  * MARTrainer   ~ ImageRestorationModel_ipretrain (:943-1463): MARLoss at
    scales 1, 1/2, 1/4 (:1184-1192).
  * LPNetTrainer ~ ImageRestorationModel_ipred (:1466-2165, active
    img_i_pred branch :1793-1799): L1(pred_ratio, mean(gray(gt))).

TPU-first design: params live replicated on a jax.sharding.Mesh, batches
are batch-sharded, gradients reduce over ICI via XLA (no DDP/NCCL code),
and each step is one compiled program with donated buffers.
"""

import functools
import logging
import warnings

import numpy as np

import jax
import jax.numpy as jnp
import optax

from fdn_tip2025_tpu.models import (
    init_fdn, fdn_forward, init_fdn_lolv1, fdn_lolv1_forward,
    init_mar, mar_forward, init_ipredict,
)
from fdn_tip2025_tpu.models.ipredict_train import (
    ipredict_forward_train, merge_bn_stats,
)
from fdn_tip2025_tpu.ops import grayscale
from fdn_tip2025_tpu.train import losses as L
from fdn_tip2025_tpu.train.schedulers import build_scheduler, with_warmup
from fdn_tip2025_tpu.train.optim import build_optimizer
from fdn_tip2025_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate_tree,
)
from jax.sharding import NamedSharding, PartitionSpec


def compute_ratio(lq, gt=None, use_ratio=True):
    """Brightness ratio (B, 1): mean-gray(lq) / mean-gray(gt).

    Always accumulates in f32 — the ratio feeds the MAR gamma exponent
    (1-(1-x)^(40m)), which is precision-sensitive (the bf16 serving mode
    keeps the same policy)."""
    glq = jnp.mean(grayscale(lq).astype(jnp.float32),
                   axis=(1, 2, 3))[:, None]
    if not use_ratio or gt is None:
        return glq.astype(lq.dtype)
    ggt = jnp.mean(grayscale(gt).astype(jnp.float32),
                   axis=(1, 2, 3))[:, None]
    return (glq / ggt).astype(lq.dtype)


def _to_bf16(tree):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, tree)


class BaseTrainer:
    """Owns params/opt_state, the jitted step, schedulers, mesh sharding."""

    _REQUIRES_VGG = False  # reference objective has an unconditional VGG term
    # bf16 mixed precision: forward/backward in bf16, f32 master weights +
    # optimizer state, losses in f32. No loss scaling needed (bf16 shares
    # f32's exponent range). The reference trains f32-only; this is a
    # TPU-native extra (train.mixed_precision: true).
    _AMP_OK = True
    # gradient accumulation (train.accumulate: K): one optimizer step per
    # K scan-accumulated micro-batches — numerically the mean-of-means
    # equals one K-times-larger batch, so the reference's global-batch
    # recipes run on smaller memory (per-block remat already trades the
    # other direction). Not in the reference (its answer was "add GPUs").
    _ACCUM_OK = True

    def __init__(self, opt, mesh=None, vgg_params=None):
        self.opt = opt
        self.mesh = mesh if mesh is not None else make_mesh()
        self.use_ratio = bool(opt.get("use_ratio", True))
        train_opt = opt["train"]
        self.grad_accum = int(train_opt.get("accumulate", 1))
        if self.grad_accum > 1 and not self._ACCUM_OK:
            raise ValueError(
                f"{type(self).__name__}: train.accumulate is unsupported — "
                "BatchNorm batch statistics make K micro-batches differ "
                "from one large batch; train LPNet with the real batch "
                "size (0.4M params, it always fits)")
        self.amp = bool(train_opt.get("mixed_precision", False))
        if self.amp and not self._AMP_OK:
            warnings.warn(
                f"{type(self).__name__}: mixed_precision requested but this "
                "model trains a precision-sensitive scalar regressor — "
                "staying f32 (same policy as bf16 serving, which keeps "
                "LPNet f32)", stacklevel=2)
            self.amp = False
        base_lr = float(train_opt["optim_g"]["lr"])
        total_iter = int(train_opt["total_iter"])
        self.total_iter = total_iter
        sched = build_scheduler(train_opt["scheduler"], base_lr, total_iter)
        self.schedule = with_warmup(sched, int(train_opt.get("warmup_iter",
                                                             -1)), base_lr)
        self.tx = build_optimizer(
            train_opt["optim_g"], self.schedule,
            use_grad_clip=train_opt.get("use_grad_clip", True),
            skip_nonfinite=train_opt.get("skip_nonfinite", True))
        self.vgg_params = vgg_params
        self.perceptual = None
        if vgg_params is not None:
            from fdn_tip2025_tpu.train.perceptual import make_perceptual_loss
            p_opt = dict(train_opt.get("perceptual_opt", {}))
            kwargs = {k: p_opt[k] for k in
                      ("layer_weights", "use_input_norm", "range_norm",
                       "perceptual_weight", "criterion") if k in p_opt}
            self.perceptual = make_perceptual_loss(vgg_params, **kwargs)
        elif self._REQUIRES_VGG:
            # The reference trains this model type with an unconditional
            # VGG term (L1+0.1*FFT+0.01*VGG for FDN,
            # image_restoration_model.py:175-177,477-491; MSE+10*VGG+...
            # for MARLoss, losses.py:764-774). Without weights the
            # objective differs — be loud, never silent.
            msg = (f"{type(self).__name__}: no VGG19 weights supplied — "
                   "the perceptual term of the reference objective is "
                   "DISABLED (pass --vgg-weights / path.vgg_weights for "
                   "the reference training recipe)")
            warnings.warn(msg, stacklevel=2)
            logging.getLogger("fdn_tip2025_tpu").warning(msg)
        seed = int(opt.get("manual_seed", 0))
        self.key = jax.random.PRNGKey(seed)
        self._build_params()
        self.opt_state = self.tx.init(self.trainable)
        self.trainable = replicate_tree(self.trainable, self.mesh)
        self.frozen = replicate_tree(self.frozen, self.mesh)
        self.opt_state = replicate_tree(self.opt_state, self.mesh)
        self.step = 0
        step_fn = (self._train_step_accum if self.grad_accum > 1
                   else self._train_step)
        self._jit_step = jax.jit(step_fn, donate_argnums=(0, 1))

    # -- subclass API ------------------------------------------------------
    def _build_params(self):
        raise NotImplementedError

    def _loss_fn(self, trainable, frozen, batch):
        raise NotImplementedError

    # ----------------------------------------------------------------------
    def _wrapped_loss_fn(self):
        loss_fn = self._loss_fn
        if self.amp:
            from fdn_tip2025_tpu.ops.context import f32_spectra

            # cast INSIDE the differentiated fn: grads of the f32->bf16
            # cast come back f32 onto the master weights automatically.
            # f32_spectra scopes the TRACE: AMP keeps full-image spectra
            # f32 (torch autocast executes FFTs in f32 — the bf16-spectra
            # storage is a serving-only byte optimization).
            def loss_fn(tr, fz, b):
                with f32_spectra():
                    return self._loss_fn(_to_bf16(tr), _to_bf16(fz),
                                         _to_bf16(b))
        return loss_fn

    def _train_step(self, trainable, opt_state, frozen, batch):
        (loss, aux), grads = jax.value_and_grad(
            self._wrapped_loss_fn(), has_aux=True)(trainable, frozen, batch)
        updates, opt_state = self.tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        if hasattr(opt_state, "total_notfinite"):
            # skipped-update counter from the apply_if_finite guard
            # (train/optim.py) — lands in the training log via aux
            aux = dict(aux, n_nonfinite_total=opt_state.total_notfinite)
        return trainable, opt_state, aux

    def _train_step_accum(self, trainable, opt_state, frozen, batch):
        """One optimizer step over K micro-batches (leading axis K).

        Grads accumulate in the params' own dtype (f32 masters under amp);
        each micro-loss is a batch mean, so the averaged grad equals the
        grad of one K*mb batch."""
        loss_fn = self._wrapped_loss_fn()

        def body(gsum, mb):
            (_, aux), g = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable, frozen, mb)
            return jax.tree.map(jnp.add, gsum, g), aux

        gsum, auxs = jax.lax.scan(
            body, jax.tree.map(jnp.zeros_like, trainable), batch)
        grads = jax.tree.map(lambda g: g / self.grad_accum, gsum)
        updates, opt_state = self.tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, jax.tree.map(jnp.mean, auxs)

    def train_step(self, batch):
        batch = {k: v for k, v in batch.items() if k in ("lq", "gt")}
        if self.grad_accum > 1:
            k = self.grad_accum
            sh = NamedSharding(self.mesh, PartitionSpec(None, "data"))
            out = {}
            for name, v in batch.items():
                if v.shape[0] % k:
                    raise ValueError(
                        f"batch size {v.shape[0]} not divisible by "
                        f"train.accumulate={k}")
                out[name] = jax.device_put(
                    v.reshape((k, v.shape[0] // k) + v.shape[1:]), sh)
            batch = out
        else:
            batch = shard_batch(batch, self.mesh)
        self.trainable, self.opt_state, aux = self._jit_step(
            self.trainable, self.opt_state, self.frozen, batch)
        self.step += 1
        return aux

    @property
    def params(self):
        """Full (trainable + frozen) model params."""
        return {**self.frozen, **self.trainable}

    def load_params(self, params, strict=True):
        """Load full model params (pretrain_network_g path), preserving the
        trainable/frozen split. strict mirrors strict_load_g: the incoming
        tree must contain exactly the expected top-level entries (the
        reference's load_network logs diffs but forces strict=False,
        base_model.py:279-284 — a bug we consciously fix)."""
        expected = set(self.frozen) | set(self.trainable)
        got = set(params)
        if strict and got != expected:
            raise KeyError(
                f"checkpoint/model key mismatch: missing {expected - got}, "
                f"unexpected {got - expected}")
        frozen = {k: params[k] for k in self.frozen if k in params}
        trainable = {k: v for k, v in params.items()
                     if k not in self.frozen and k in expected}
        self.frozen = replicate_tree({**self.frozen, **frozen}, self.mesh)
        self.trainable = replicate_tree(
            {**self.trainable, **trainable}, self.mesh)

    def current_lr(self):
        return float(self.schedule(self.step))


class FDNTrainer(BaseTrainer):
    """model_type: ImageRestorationModel — trains FDformer, MAR frozen."""

    _REQUIRES_VGG = True

    def __init__(self, opt, mesh=None, vgg_params=None, mar_params=None,
                 variant="fdn"):
        self.variant = variant
        self._mar_params = mar_params
        # config-driven losses (FDN.yml pixel_opt/fft_loss_opt), with the
        # reference defaults: L1 weight 1.0 + FFTLoss weight 0.1
        # (image_restoration_model.py:477-491).
        train_opt = opt.get("train", {})
        self._cri_pix = L.build_loss(train_opt.get(
            "pixel_opt",
            {"type": "L1Loss", "loss_weight": 1.0, "reduction": "mean"}))
        self._cri_fft = L.build_loss(train_opt.get(
            "fft_loss_opt",
            {"type": "FFTLoss", "loss_weight": 0.1, "reduction": "mean"}))
        super().__init__(opt, mesh, vgg_params)

    def _build_params(self):
        init = init_fdn if self.variant == "fdn" else init_fdn_lolv1
        full = init(self.key)
        if self._mar_params is not None:
            full["net_a"] = self._mar_params["net_a"] \
                if "net_a" in self._mar_params else self._mar_params
        # MAR frozen (FDN_arch.py:858-859); everything else trains.
        self.frozen = {"net_a": full["net_a"]}
        self.trainable = {k: v for k, v in full.items() if k != "net_a"}

    def _loss_fn(self, trainable, frozen, batch):
        params = {**frozen, **trainable}
        lq, gt = batch["lq"], batch["gt"]
        ratio = compute_ratio(lq, gt, self.use_ratio)
        fwd = fdn_forward if self.variant == "fdn" else fdn_lolv1_forward
        out = fwd(params, lq, ratio)[0]
        # losses in f32 regardless of the compute dtype (mixed_precision)
        out = out.astype(jnp.float32)
        gt = gt.astype(jnp.float32)
        l_pix = self._cri_pix(out, gt)
        l_fft = self._cri_fft(out, gt)
        total = l_pix + l_fft
        aux = {"l_pix": l_pix, "l_fft": l_fft}
        if self.perceptual is not None:
            l_per = self.perceptual(out, gt)
            total = total + l_per
            aux["l_per"] = l_per
        aux["l_total"] = total
        return total, aux


class MARTrainer(BaseTrainer):
    """model_type: ImageRestorationModel_ipretrain — 3-scale MARLoss."""

    _REQUIRES_VGG = True

    def _build_params(self):
        self.trainable = init_mar(self.key)
        self.frozen = {}

    def _loss_fn(self, trainable, frozen, batch):
        lq, gt = batch["lq"], batch["gt"]
        ratio = compute_ratio(lq, gt, self.use_ratio)[..., None, None]
        out_q, out_h, out_f = mar_forward(trainable, lq, ratio)
        out_q, out_h, out_f, gt = (a.astype(jnp.float32)
                                   for a in (out_q, out_h, out_f, gt))
        l1 = L.mar_loss(out_f, gt, self.perceptual, scale=1.0)
        l2 = L.mar_loss(out_h, gt, self.perceptual, scale=0.5)
        l3 = L.mar_loss(out_q, gt, self.perceptual, scale=0.25)
        total = l1 + l2 + l3
        return total, {"l_i1": l1, "l_i2": l2, "l_i3": l3, "l_total": total}


class LPNetTrainer(BaseTrainer):
    """model_type: ImageRestorationModel_ipred — ratio regression."""

    _AMP_OK = False  # scalar-ratio regressor stays f32 (serving policy)
    _ACCUM_OK = False  # BN batch stats: K micro-batches != one big batch

    def _build_params(self):
        self.trainable = init_ipredict(self.key)
        self.frozen = {}

    def _loss_fn(self, trainable, frozen, batch):
        lq, gt = batch["lq"], batch["gt"]
        target = jnp.mean(grayscale(gt), axis=(1, 2, 3))[:, None]
        pred, new_stats = ipredict_forward_train(trainable, lq)
        l_pix = L.l1_loss(pred, target)
        return l_pix, {"l_pix": l_pix, "l_total": l_pix,
                       "_bn_stats": new_stats}

    def _train_step(self, trainable, opt_state, frozen, batch):
        (loss, aux), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(trainable, frozen, batch)
        new_stats = aux.pop("_bn_stats")
        # BN running stats are buffers, not gradients — drop their grads
        # and fold the updated stats in after the optimizer step.
        updates, opt_state = self.tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        trainable = merge_bn_stats(trainable, jax.lax.stop_gradient(
            new_stats))
        return trainable, opt_state, aux


TRAINERS = {
    "ImageRestorationModel": FDNTrainer,
    "ImageRestorationModel_ipretrain": MARTrainer,
    "ImageRestorationModel_ipred": LPNetTrainer,
}


def create_trainer(opt, **kwargs):
    """Mirror of the reference's create_model registry
    (basicsr/models/__init__.py:35-56), keyed on model_type."""
    cls = TRAINERS[opt["model_type"]]
    return cls(opt, **kwargs)
