"""The jitted training/eval step functions.

One XLA program performs what the reference spreads over Python
(model_v1/train.py:113-128): LR schedule, SAM first pass (grad at w),
perturbation, second pass (grad at w + e(w)), AdamW update at w, and the EMA
update with the n = iter/2 convention. Under a batch-sharded input the same
program is the multi-chip data-parallel program — XLA inserts the gradient
all-reduce because the loss averages over the global batch.

The tri-masked MMS trainer (model_sgm_mms_attach/train.py:76-97: random .30 /
block .20 / span_old .20 forwards averaged, x2 under SAM) is a loss-mode
switch here, not a separate codebase.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from htr_vt_tpu.config import ExperimentConfig
from htr_vt_tpu.ops.ctc import ctc_loss_auto
from htr_vt_tpu.optim.ema import ema_update
from htr_vt_tpu.optim.sam import make_base_optimizer, sam_perturb
from htr_vt_tpu.train.state import TrainState

Batch = Dict[str, jax.Array]

# Tri-masked trainer's (mode, ratio) schedule — reference
# model_sgm_mms_attach/train.py:76-97.
TRI_MASK_MODES = (("random", 0.30), ("block", 0.20), ("span_old", 0.20))


def _forward_loss(model, cfg: ExperimentConfig, params, batch_stats,
                  batch: Batch, rng: jax.Array, mask_mode: Optional[str],
                  mask_ratio: Optional[float] = None,
                  step: Optional[jax.Array] = None):
    """One masked forward + CTC (+ optional SGM) loss. Returns (loss, aux)."""
    mask_rng, drop_rng = jax.random.split(rng)
    if cfg.model.model_type == "encoder_decoder":
        from htr_vt_tpu.models.encoder_decoder import teacher_forcing_loss
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], batch["ed_input"], train=True, use_masking=True,
            mask_mode=mask_mode, mask_ratio=mask_ratio,
            rngs={"mask": mask_rng, "dropout": drop_rng},
            mutable=["batch_stats"])
        loss = teacher_forcing_loss(logits, batch["ed_output"],
                                    label_smoothing=cfg.model.label_smoothing)
        return loss, {"batch_stats": mutated.get("batch_stats", batch_stats),
                      "loss_ctc": loss}
    use_sgm = cfg.model.sgm.enable and "sgm_tgt" in batch
    sgm_batch = {k: batch[k] for k in
                 ("sgm_left", "sgm_right", "sgm_tgt", "sgm_mask")} if use_sgm else None
    out, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["image"], train=True, use_masking=True, mask_mode=mask_mode,
        mask_ratio=mask_ratio, sgm_batch=sgm_batch,
        rngs={"mask": mask_rng, "dropout": drop_rng},
        mutable=["batch_stats"])
    if use_sgm:
        logits, loss_sgm = out
    else:
        logits, loss_sgm = out, None

    loss_ctc = ctc_loss_auto(logits, batch["labels"], batch["label_lengths"]).mean()
    aux = {"batch_stats": mutated.get("batch_stats", batch_stats),
           "loss_ctc": loss_ctc}
    if use_sgm:
        sgm = cfg.model.sgm
        aux["loss_sgm"] = loss_sgm
        # SGM warmup gate (reference model_sgm_2/train.py:37,139: the SGM loss
        # is disabled until nb_iter >= sgm_warmup_iters). Trace-safe: the gate
        # is a scalar multiplier, no recompilation across the threshold.
        sgm_scale = jnp.asarray(sgm.sgm_lambda, jnp.float32)
        if sgm.warmup_iters > 0 and step is not None:
            sgm_scale = sgm_scale * (step >= sgm.warmup_iters).astype(jnp.float32)
        loss = sgm.ctc_lambda * loss_ctc + sgm_scale * loss_sgm
    else:
        loss = loss_ctc
    return loss, aux


def make_loss_fn(model, cfg: ExperimentConfig) -> Callable:
    """Build the per-pass loss: single-mask (model_v1) or tri-masked (MMS)."""
    if not cfg.train.tri_masked:
        def loss_fn(params, batch_stats, batch, rng, step=None):
            return _forward_loss(model, cfg, params, batch_stats, batch, rng,
                                 mask_mode=None, step=step)
        return loss_fn

    def tri_loss_fn(params, batch_stats, batch, rng, step=None):
        total = 0.0
        aux = {}
        bs = batch_stats
        rngs = jax.random.split(rng, len(TRI_MASK_MODES))
        for i, (mode, ratio) in enumerate(TRI_MASK_MODES):
            li, ai = _forward_loss(model, cfg, params, bs, batch, rngs[i],
                                   mask_mode=mode, mask_ratio=ratio, step=step)
            total = total + li
            bs = ai["batch_stats"]
        aux["batch_stats"] = bs
        aux["loss_ctc"] = total / len(TRI_MASK_MODES)
        return total / len(TRI_MASK_MODES), aux

    return tri_loss_fn


def _make_accum_grad_fn(loss_fn, grad_accum: int):
    """Microbatched value_and_grad: lax.scan over `grad_accum` slices of the
    batch, accumulating gradients and losses; BN statistics thread through
    the carry so each microbatch normalizes with its own stats (standard
    accumulation semantics). Returns the same ((loss, aux), grads) shape as
    jax.value_and_grad(loss_fn, has_aux=True), with loss/grads averaged over
    microbatches — so SAM's perturbation/global-norm math sees exactly the
    mean-gradient of the full effective batch."""
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def accum(params, batch_stats, batch: Batch, rng, step):
        b = next(iter(batch.values())).shape[0]
        if b % grad_accum:
            raise ValueError(
                f"batch size {b} not divisible by grad_accum={grad_accum}")
        micro = {k: v.reshape((grad_accum, b // grad_accum) + v.shape[1:])
                 for k, v in batch.items()}
        rngs = jax.random.split(rng, grad_accum)

        def body(carry, xs):
            bs, gsum, lsum = carry
            mb, r = xs
            (li, aux_i), gi = grad_fn(params, bs, mb, r, step)
            gsum = jax.tree.map(jnp.add, gsum, gi)
            scalars = {k: v for k, v in aux_i.items() if k != "batch_stats"}
            return (aux_i["batch_stats"], gsum, lsum + li), scalars

        init = (batch_stats, jax.tree.map(jnp.zeros_like, params),
                jnp.zeros((), jnp.float32))
        (bs, gsum, lsum), scalars = jax.lax.scan(body, init, (micro, rngs))
        grads = jax.tree.map(lambda g: g / grad_accum, gsum)
        aux = {"batch_stats": bs,
               **{k: jnp.mean(v) for k, v in scalars.items()}}
        return (lsum / grad_accum, aux), grads

    return accum


def train_step(model, cfg: ExperimentConfig, state: TrainState,
               batch: Batch) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One full SAM iteration. Pure; jit (or shard_map) this."""
    tx = make_base_optimizer(cfg.optim)
    loss_fn = make_loss_fn(model, cfg)

    rng, rng1, rng2 = jax.random.split(state.rng, 3)
    if cfg.train.grad_accum > 1:
        grad_fn = _make_accum_grad_fn(loss_fn, cfg.train.grad_accum)
    else:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    # SAM pass 1: gradient at w (reference train.py:122-124).
    (loss1, aux1), grads1 = grad_fn(state.params, state.batch_stats, batch, rng1,
                                    state.step)
    params_adv, gnorm = sam_perturb(state.params, grads1, cfg.optim.sam_rho,
                                    cfg.optim.sam_adaptive)

    # SAM pass 2: gradient at w + e(w), fresh mask randomness and sequential
    # BN-stat update, matching the reference's second full forward
    # (train.py:125-126).
    (loss2, aux2), grads2 = grad_fn(params_adv, aux1["batch_stats"], batch, rng2,
                                    state.step)

    updates, new_opt_state = tx.update(grads2, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_batch_stats = aux2["batch_stats"]

    # EMA with n = iter/2 (reference train.py:128).
    num_updates = state.step.astype(jnp.float32)
    if cfg.optim.ema_halved_updates:
        num_updates = num_updates / 2.0
    new_ema_params = ema_update(state.ema_params, new_params, num_updates,
                                cfg.optim.ema_decay)
    new_ema_bs = ema_update(state.ema_batch_stats, new_batch_stats, num_updates,
                            cfg.optim.ema_decay)

    new_state = state.replace(
        step=state.step + 1, params=new_params, batch_stats=new_batch_stats,
        opt_state=new_opt_state, ema_params=new_ema_params,
        ema_batch_stats=new_ema_bs, rng=rng)
    metrics = {"loss": loss1, "loss_second": loss2, "grad_norm": gnorm}
    if "loss_sgm" in aux1:
        metrics["loss_sgm"] = aux1["loss_sgm"]
        metrics["loss_ctc"] = aux1["loss_ctc"]
    return new_state, metrics


def eval_step(model, cfg: ExperimentConfig, params, batch_stats,
              batch: Batch, extra_vars=None) -> Dict[str, jax.Array]:
    """Eval forward on given weights (the loop passes EMA weights, matching
    the reference's EMA-eval convention, train.py:149-153). Returns logits,
    per-frame argmax and batch-mean CTC loss. ``extra_vars``: additional
    variable collections closed over at jit time (e.g. calibrated
    quant_stats for the static int8 path)."""
    variables = {"params": params, "batch_stats": batch_stats,
                 **(extra_vars or {})}
    logits = model.apply(variables, batch["image"], train=False)
    loss_per_sample = ctc_loss_auto(logits, batch["labels"],
                                    batch["label_lengths"])
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    # loss_per_sample lets validate() exclude the repeated-sample padding rows
    # eval_batches appends to fill the last batch (the reference has no such
    # rows — its loader just emits a short final batch, valid.py:30-38).
    return {"logits": logits, "pred_ids": preds,
            "loss": loss_per_sample.mean(),
            "loss_per_sample": loss_per_sample}


def jit_train_step(model, cfg: ExperimentConfig, donate: bool = True):
    step = functools.partial(train_step, model, cfg)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def jit_eval_step(model, cfg: ExperimentConfig, extra_vars=None):
    return jax.jit(functools.partial(eval_step, model, cfg,
                                     extra_vars=extra_vars))


def eval_step_ed(model, cfg: ExperimentConfig, params, batch_stats,
                 batch: Batch) -> Dict[str, jax.Array]:
    """Encoder-decoder eval: teacher-forcing loss + greedy generation
    (evaluate_encoder_decoder semantics, data/utils/encoder_decoder_utils.py:117)."""
    from htr_vt_tpu.models.encoder_decoder import generate, teacher_forcing_loss
    variables = {"params": params, "batch_stats": batch_stats}
    logits = model.apply(variables, batch["image"], batch["ed_input"], train=False)
    loss = teacher_forcing_loss(logits, batch["ed_output"],
                                label_smoothing=cfg.model.label_smoothing)
    pred_ids = generate(model, variables, batch["image"], method="greedy",
                        max_len=batch["ed_input"].shape[1])
    return {"pred_ids": pred_ids, "loss": loss}


def jit_eval_step_ed(model, cfg: ExperimentConfig):
    return jax.jit(functools.partial(eval_step_ed, model, cfg))
