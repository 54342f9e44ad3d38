"""The training driver.

Functional equivalent of the reference's main() (model_v1/train.py:33-231):
data + model + SAM/EMA + periodic EMA-weight validation + best-CER/WER
checkpoints + scalars — but as one jit-compiled step over a device mesh with
host-side work overlapped through the prefetching loader.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict

import jax
import numpy as np

from htr_vt_tpu.config import ExperimentConfig, config_to_dict
from htr_vt_tpu.data.loader import (TrainLoader, build_dataset, choose_max_label_len,
                                    device_prefetch, eval_batches, make_converter)
from htr_vt_tpu.eval.validate import validate
from htr_vt_tpu.models.htr_vt import build_model
from htr_vt_tpu.parallel.mesh import batch_sharding, make_mesh, maybe_initialize_distributed
from htr_vt_tpu.train.checkpoint import CheckpointManager
from htr_vt_tpu.train.state import create_train_state, param_count
from htr_vt_tpu.train.step import jit_eval_step, jit_train_step
from htr_vt_tpu.utils.logging import ScalarWriter, StepTimer, get_logger, maybe_profile


def fit(cfg: ExperimentConfig) -> Dict[str, float]:
    """Run training to cfg.train.total_iters. Returns final best metrics.

    Multi-host aware: under a multi-process runtime (HTRVT_COORDINATOR), every
    process runs this same function — each loads its shard of every global
    batch (cfg.data.train_bs is the GLOBAL batch size), collectives ride the
    jitted step, and process 0 alone owns run.log/metrics.jsonl/TB/wandb and
    Orbax saves. Best-metric decisions are identical everywhere because eval
    allgathers predictions (eval/validate.py). Assumes ranks share the run
    directory (one machine or a shared filesystem) for resume.
    """
    maybe_initialize_distributed()
    rank, nproc = jax.process_index(), jax.process_count()
    is_main = rank == 0
    save_dir = os.path.join(cfg.train.out_dir, cfg.train.exp_name)
    os.makedirs(save_dir, exist_ok=True)
    logger = get_logger(save_dir, write_file=is_main)
    if is_main:
        logger.info(json.dumps(config_to_dict(cfg), indent=2, sort_keys=True,
                               default=str))
    if cfg.data.train_bs % nproc:
        raise ValueError(f"global train_bs {cfg.data.train_bs} not divisible "
                         f"by process count {nproc}")
    if cfg.data.val_bs % nproc:
        raise ValueError(f"global val_bs {cfg.data.val_bs} not divisible "
                         f"by process count {nproc}")

    # ---- data ----
    train_ds = build_dataset(cfg.data, "train")
    val_ds = build_dataset(cfg.data, "val")
    converter = make_converter(cfg.data, train_ds)
    if converter.num_classes != cfg.model.nb_cls:
        logger.info("adjusting nb_cls %d -> %d (alphabet size)",
                    cfg.model.nb_cls, converter.num_classes)
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, nb_cls=converter.num_classes))
    num_frames = cfg.model.num_tokens
    max_label_len = choose_max_label_len(train_ds.labels, num_frames)

    sgm_extras_fn, sgm_sample, ed_tokenizer = None, None, None
    if cfg.model.model_type == "encoder_decoder":
        from htr_vt_tpu.text.ed_tokenizer import EDTokenizer
        ed_tokenizer = EDTokenizer.from_ctc_converter(converter)
        ed_len = min(max_label_len + 2, cfg.model.max_seq_len)
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, ed_vocab_size=ed_tokenizer.vocab_size))

        def sgm_extras_fn(texts):  # reuse the extras hook for ED arrays
            tin, tout, tlen = ed_tokenizer.encode_for_training(texts, ed_len)
            return {"ed_input": tin, "ed_output": tout, "ed_lengths": tlen}
    elif cfg.model.sgm.enable:
        from htr_vt_tpu.models.sgm import SGMVocab, make_context_arrays
        sgm_vocab = SGMVocab(converter)
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, sgm=dataclasses.replace(cfg.model.sgm,
                                               vocab_size=sgm_vocab.size)))
        sub_len = cfg.model.sgm.sub_len
        sgm_extras_fn = lambda texts: make_context_arrays(
            texts, sgm_vocab, max_label_len, sub_len)
        sgm_sample = make_context_arrays([""], sgm_vocab, max_label_len, sub_len)
        sgm_sample = {k: np.repeat(v, cfg.data.train_bs, axis=0)
                      for k, v in sgm_sample.items()}
    model = build_model(cfg.model)
    logger.info("train=%d val=%d alphabet=%d max_label_len=%d",
                len(train_ds), len(val_ds), converter.num_classes, max_label_len)

    # ---- mesh + state ----
    mesh = make_mesh(cfg.parallel)
    bsh = batch_sharding(mesh, cfg.parallel)
    sample = np.zeros((cfg.data.train_bs, *cfg.model.img_size, 1), np.float32)
    state = create_train_state(cfg, model, jax.random.PRNGKey(cfg.train.seed),
                               sample, sgm_sample=sgm_sample)
    logger.info("total_param is %d", param_count(state.params))

    ckpt = CheckpointManager(save_dir, keep=cfg.train.keep_checkpoints)
    best_cer, best_wer, start_step = 1e6, 1e6, 0

    if cfg.train.load_model:
        # Weight-only initialization (fresh optimizer/step); optionally just
        # the encoder trunk for transfer learning.
        src_mgr = CheckpointManager(os.path.dirname(
            cfg.train.load_model.rstrip("/")) or ".")
        loaded, _ = src_mgr.restore(cfg.train.load_model, state)
        if cfg.train.load_encoder_only:
            head_keys = {"head", "sgm_head", "lm_head", "embed", "final_norm"}
            params = dict(state.params)
            ema = dict(state.ema_params)
            for k in loaded.params:
                if k not in head_keys:
                    params[k] = loaded.params[k]
                    ema[k] = loaded.ema_params[k]
            state = state.replace(params=params, ema_params=ema,
                                  batch_stats=loaded.batch_stats,
                                  ema_batch_stats=loaded.ema_batch_stats)
            logger.info("loaded encoder weights from %s", cfg.train.load_model)
        else:
            state = state.replace(params=loaded.params,
                                  ema_params=loaded.ema_params,
                                  batch_stats=loaded.batch_stats,
                                  ema_batch_stats=loaded.ema_batch_stats)
            logger.info("loaded model weights from %s", cfg.train.load_model)

    resume = cfg.train.resume
    if resume == "auto":
        # Elastic restart convenience: pick up the latest rolling checkpoint
        # in the run directory if one exists (fresh start otherwise).
        # Multi-host: rank 0 alone decides and broadcasts — ranks listing the
        # directory independently can race rank 0's in-flight save and pick
        # different steps, which deadlocks the collective schedules.
        resume = ckpt.latest_path() if is_main else None
        if nproc > 1:
            resume = _broadcast_str(resume)
        if resume:
            logger.info("auto-resume found %s", resume)
    if resume:
        state, meta = ckpt.restore(resume, state)
        best_cer = float(meta.get("best_cer", best_cer))
        best_wer = float(meta.get("best_wer", best_wer))
        start_step = int(state.step)
        logger.info("resumed at step %d (best CER %.4f WER %.4f)",
                    start_step, best_cer, best_wer)

    # start_batch=start_step makes resume STREAM-EXACT: the loader's batch b
    # is a pure function of (seed, b), and exactly one batch is consumed per
    # step, so "train N" == "train k, resume, train N-k" batch-for-batch
    # (tests/test_train_loop.py pins the equivalence). The reference saves
    # four RNG streams but cannot restore mid-epoch DataLoader position
    # (model_v1/utils/utils.py:253-268).
    loader = TrainLoader(train_ds, converter, cfg.data.train_bs // nproc,
                         max_label_len,
                         augment=cfg.data.augment, seed=cfg.train.seed,
                         num_threads=cfg.data.num_workers, extras_fn=sgm_extras_fn,
                         sampling=cfg.data.sampling, start_batch=start_step,
                         shard_rank=rank, shard_count=nproc)
    batches = device_prefetch(iter(loader), bsh)

    train_fn = jit_train_step(model, cfg, donate=cfg.train.donate_state)
    if cfg.model.model_type == "encoder_decoder":
        from htr_vt_tpu.train.step import jit_eval_step_ed
        eval_fn = jit_eval_step_ed(model, cfg)
        eval_codec = ed_tokenizer
    else:
        eval_fn = jit_eval_step(model, cfg)
        eval_codec = converter
    writer = ScalarWriter(save_dir, cfg.train.use_wandb, cfg.train.wandb_project,
                          cfg.train.exp_name, config_to_dict(cfg),
                          enabled=is_main)
    # Rate windows close at the print cadence, AFTER the loss fetch syncs the
    # host on that window's device work (StepTimer docstring: dispatch-time
    # windows read ~2x over wall-clock). First printed line carries a real
    # img/s for any print interval, including compile amortization.
    timer = StepTimer()

    train_loss, train_loss_count = 0.0, 0
    pending_losses: list = []  # device scalars; fetched at print cadence so
    # the host never stalls the dispatch pipeline with per-step syncs.
    logger.info("Start training...")
    for step in range(start_step, cfg.train.total_iters):
        maybe_profile(cfg.train.profile_dir, step)
        batch = next(batches)
        state, metrics = train_fn(state, batch)
        pending_losses.append(metrics["loss"])

        it = step + 1
        if it % cfg.train.print_iters == 0:
            fetched = [float(x) for x in pending_losses]
            pending_losses.clear()
            timer.close_window(len(fetched), cfg.data.train_bs)

            # Failure detection: a window of non-finite losses aborts with an
            # emergency checkpoint instead of silently corrupting the run
            # (detection latency = print_iters steps; the reference has none).
            bad = sum(not np.isfinite(v) for v in fetched)
            if cfg.train.max_nonfinite_steps > 0 and bad >= cfg.train.max_nonfinite_steps:
                # losses are replicated: every rank reaches this branch, so
                # the all-rank save contract (CheckpointManager.save) holds
                ckpt.save(state, cer=999.0, wer=999.0, best_cer=best_cer,
                          best_wer=best_wer,
                          meta={"emergency": True, "config": config_to_dict(cfg)})
                loader.close()
                writer.close()
                raise FloatingPointError(
                    f"{bad} non-finite losses in the last {len(fetched)} steps; "
                    f"emergency checkpoint saved in {save_dir}")

            train_loss += sum(v for v in fetched if np.isfinite(v))
            train_loss_count += len(fetched)
            avg = train_loss / max(1, train_loss_count)
            logger.info("Iter : %d \t training loss : %.5f \t img/s : %.1f",
                        it, avg, timer.rate)
            writer.write(it, {"train/loss": avg, "train/imgs_per_sec": timer.rate,
                              "train/grad_norm": float(metrics["grad_norm"])})
            train_loss, train_loss_count = 0.0, 0

        if it % cfg.train.eval_iters == 0 or it == cfg.train.total_iters:
            eval_extras = sgm_extras_fn if cfg.model.model_type == "encoder_decoder" else None
            val_loss, cer, wer, _, _ = validate(
                eval_fn, state.ema_params, state.ema_batch_stats,
                eval_batches(val_ds, converter, cfg.data.val_bs, max_label_len,
                             extras_fn=eval_extras),
                eval_codec, sharding=bsh)
            improved_cer, improved_wer = cer < best_cer, wer < best_wer
            best_cer, best_wer = min(cer, best_cer), min(wer, best_wer)
            # metrics are identical on every rank (validate allgathers
            # predictions); all ranks enter save() in lockstep and Orbax +
            # CheckpointManager write from rank 0 only
            ckpt.save(state, cer=cer, wer=wer, best_cer=best_cer,
                      best_wer=best_wer,
                      meta={"config": config_to_dict(cfg)})
            logger.info("Val. loss : %.3f \t CER : %.4f \t WER : %.4f%s%s",
                        val_loss, cer, wer,
                        " [best CER]" if improved_cer else "",
                        " [best WER]" if improved_wer else "")
            writer.write(it, {"val/loss": val_loss, "val/CER": cer, "val/WER": wer,
                              "val/best_CER": best_cer, "val/best_WER": best_wer})
            # reset the rate window so eval/checkpoint wall time doesn't
            # deflate the next printed train img/s
            timer.close_window(0, 0)

    loader.close()
    writer.close()
    if nproc > 1:
        # Exit barrier: no rank may leave (and e.g. auto-resume a follow-up
        # run) while rank 0's final Orbax write is still in flight.
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("htrvt_fit_end")
    return {"best_cer": best_cer, "best_wer": best_wer}


def _broadcast_str(s) -> "str | None":
    """Broadcast rank 0's (possibly None) string to every process."""
    from jax.experimental import multihost_utils
    cap = 4096
    buf = np.zeros(cap, np.uint8)
    if s:
        b = s.encode()
        if len(b) > cap:  # never silently truncate a checkpoint path
            raise ValueError(f"broadcast string exceeds {cap} bytes: {s!r}")
        buf[:len(b)] = np.frombuffer(b, np.uint8)
    out = bytes(np.asarray(multihost_utils.broadcast_one_to_all(buf)))
    out = out.rstrip(b"\x00").decode()
    return out or None
