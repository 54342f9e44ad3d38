"""Dual-stack trajectory parity: train the REFERENCE torch stack and this
framework side by side on the same data stream, and compare CER/WER.

Round-2/3 verdicts: the strongest accuracy-parity evidence obtainable without
the real datasets mounted. Both stacks start from the same torch-initialized
weights (utils/torch_convert.py), consume the IDENTICAL batch stream (the
deterministic loader's batch b is a pure function of (seed, b) — including
host augmentations, so both stacks see the same pixels), and run the same
recipe: SAM(AdamW) + warmup-cosine + EMA, the torch side driven by the
reference's own utils/sam.py and the literal train-loop order of
model_v1/train.py:113-128. Token masking is OFF on both sides so the
trajectories are deterministic (mask randomness matches in distribution, not
stream — same policy as tests/test_reference_model_parity.py).

Round-4 upgrade (verdict #1): the round-3 run stopped at 300 iters with both
stacks still in CTC blank-collapse (CER 1.0) — loss curves tracked but the
CER contract was never exercised. This version makes the task easy enough to
EXIT collapse within a CPU budget (small alphabet, short canvas-trimmed
labels, full-size reference architecture) and evaluates EMA CER/WER at
intermediate checkpoints on both stacks, so the comparison is CER-
differentiating: done = both stacks reach CER < 0.5 and agree within ±0.1.

The JAX half runs FIRST (it is ~5-10x faster on CPU): if it never exits
collapse the run aborts before paying for the torch half. --pilot runs only
the JAX half, to size --iters before committing to the torch cost.

What "parity" means over hundreds of iterations: training is a chaotic
system, so the ~1e-4-relative cross-backend (oneDNN vs XLA) conv noise the
3-iteration test quantifies compounds; per-iteration losses cannot stay
bit-close forever. The claim this tool checks is the one that matters for
the ±0.1-CER contract: the two stacks' loss CURVES track each other
(windowed means within tolerance) and they reach the same end-quality
(CER/WER from EMA weights within tolerance) on the same stream.

Usage (CPU-sized; torch dominates the cost on 1 core):
    python tools/dual_stack_parity.py --pilot --iters 800 --bs 16
    python tools/dual_stack_parity.py --iters 800 --bs 16 --out docs/parity
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--img-w", type=int, default=192)
    ap.add_argument("--ckpts", type=int, default=4,
                    help="number of evenly-spaced EMA CER/WER checkpoints")
    ap.add_argument("--eval-size", type=int, default=64)
    ap.add_argument("--synth-size", type=int, default=256)
    ap.add_argument("--alphabet", type=str, default="aehilnorst ",
                    help="small alphabet -> easy task that exits blank-"
                         "collapse within a CPU budget")
    ap.add_argument("--min-len", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=16)
    ap.add_argument("--scale", type=str, default="0.5,0.7",
                    help="glyph scale range lo,hi — small glyphs pack more "
                         "chars per canvas, raising label density (chars per "
                         "CTC frame), which is what drives blank-collapse "
                         "exit speed")
    ap.add_argument("--max-lr", type=float, default=3e-3)
    ap.add_argument("--no-augment", action="store_true")
    ap.add_argument("--pilot", action="store_true",
                    help="run only the JAX half (fast) to size --iters")
    ap.add_argument("--jax-tpu", action="store_true",
                    help="run the JAX half on the real TPU chip (f32, "
                         "highest matmul precision) instead of CPU — ~100x "
                         "faster and leaves the single CPU core to the torch "
                         "half; the cross-backend claim is the real-world "
                         "one (reference-on-GPU vs this-framework-on-TPU)")
    ap.add_argument("--out", type=str, default="docs/parity")
    ap.add_argument("--seed", type=int, default=7,
                    help="data seed: fixes the synthetic datasets AND the "
                         "deterministic batch stream")
    ap.add_argument("--init-seed", type=int, default=None,
                    help="weight-init seed (torch.manual_seed), default = "
                         "--seed. Round-5 seed-variance protocol: keep --seed "
                         "fixed (same task, same stream) and vary --init-seed "
                         "so the per-seed (torch CER, jax CER) pairs sample "
                         "the training-noise distribution on ONE task; the "
                         "spread of the pair diffs bounds whether the round-4 "
                         "0.020 gap is systematic or chaotic-trajectory noise")
    ap.add_argument("--stack", choices=("both", "jax", "torch"),
                    default="both",
                    help="split the run so the TPU is not held hostage by "
                         "the hours-long torch half: --stack jax trains the "
                         "JAX half (optionally on TPU) and writes a "
                         "*.jax.json sidecar; --stack torch runs CPU-only "
                         "(never claims the TPU), loads the sidecar, and "
                         "emits the full comparison")
    args = ap.parse_args()
    if args.init_seed is None:
        args.init_seed = args.seed
    if args.stack == "torch":
        args.jax_tpu = False

    # Default: CPU-sized comparison (the axon sitecustomize would otherwise
    # route the JAX half onto the real TPU; env JAX_PLATFORMS is NOT honored
    # — the backend is pre-registered; only this config update is
    # authoritative). --jax-tpu keeps the TPU backend.
    import jax
    if not args.jax_tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/htrvt_jax_cache")
    import jax.numpy as jnp

    from htr_vt_tpu.config import (AugmentConfig, DataConfig, ExperimentConfig,
                                   MaskConfig, ModelConfig, OptimConfig,
                                   TrainConfig)
    from htr_vt_tpu.data.loader import (TrainLoader, choose_max_label_len,
                                        eval_batches)
    from htr_vt_tpu.data.synthetic import SyntheticLineDataset
    from htr_vt_tpu.models.htr_vt import HTRVT
    from htr_vt_tpu.optim.sam import make_base_optimizer
    from htr_vt_tpu.optim.schedule import warmup_cosine_lr
    from htr_vt_tpu.text.converter import CTCLabelConverter
    from htr_vt_tpu.text.metrics import RecognitionMetrics
    from htr_vt_tpu.train.state import TrainState
    from htr_vt_tpu.train.step import jit_eval_step, jit_train_step
    from htr_vt_tpu.utils.torch_convert import reference_state_dict_to_tree

    H, W = 64, args.img_w
    T = (W // 4) * (H // 64)

    # Canvas-trimmed short labels: every label fully renders inside the
    # narrow canvas, so image and transcript agree (without trimming, the
    # default 4..28-char SYNTH labels overflow a 192-px canvas and the task
    # is unlearnable — a contributor to the round-3 CER-1.0 outcome).
    scale = tuple(float(x) for x in args.scale.split(","))
    train_ds = SyntheticLineDataset(args.synth_size, args.alphabet,
                                    seed=args.seed, height=H, width=W,
                                    min_len=args.min_len, max_len=args.max_len,
                                    trim_to_canvas=True, scale_range=scale)
    val_ds = SyntheticLineDataset(args.eval_size, args.alphabet,
                                  seed=args.seed + 1, height=H, width=W,
                                  min_len=args.min_len, max_len=args.max_len,
                                  trim_to_canvas=True, scale_range=scale)
    converter = CTCLabelConverter(train_ds.alphabet)
    nb_cls = converter.num_classes
    max_label_len = choose_max_label_len(train_ds.labels, T)

    augment = None if args.no_augment else AugmentConfig()
    dcfg = DataConfig(dataset="SYNTH", img_size=(H, W), train_bs=args.bs,
                      val_bs=args.bs, synth_train_size=args.synth_size,
                      synth_eval_size=args.eval_size,
                      synth_alphabet=args.alphabet)
    optim = OptimConfig(max_lr=args.max_lr, warmup_iters=max(args.iters // 10, 4),
                        total_iters=args.iters, weight_decay=0.5, sam_rho=0.05,
                        ema_decay=0.9999)
    cfg = ExperimentConfig(
        model=ModelConfig(nb_cls=nb_cls, img_size=(H, W),
                          compute_dtype="float32",
                          masking=MaskConfig(mode="none")),
        optim=optim, data=dcfg, train=TrainConfig(tri_masked=False))

    ckpt_iters = sorted({max(1, round(args.iters * k / args.ckpts))
                         for k in range(1, args.ckpts + 1)})

    # ---- shared init: torch weights -> our tree ---------------------------
    import torch
    torch.manual_seed(args.init_seed)
    from test_reference_model_parity import _install_timm_stub  # tests/
    import importlib.util
    _install_timm_stub()
    REF_DIR = "/root/reference/model_v1"
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    spec = importlib.util.spec_from_file_location(
        "model.HTR_VT", f"{REF_DIR}/model/HTR_VT.py")
    ref_htr_vt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_htr_vt)
    spec = importlib.util.spec_from_file_location(
        "ref_sam", f"{REF_DIR}/utils/sam.py")
    ref_sam = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_sam)

    tmodel = ref_htr_vt.create_model(nb_cls=nb_cls, img_size=[H, W])
    tmodel.train()
    sd = {k: np.array(v.detach().numpy(), copy=True)
          for k, v in tmodel.state_dict().items()}
    params, stats, unused = reference_state_dict_to_tree(sd)
    assert unused == [], unused
    f32 = lambda t: jax.tree.map(lambda a: jnp.array(a, jnp.float32, copy=True), t)
    params, stats = f32(params), f32(stats)

    # ---- one deterministic batch stream, materialized once ----------------
    loader = TrainLoader(train_ds, converter, args.bs, max_label_len,
                         augment=augment, seed=args.seed, num_threads=2)
    batches = [next(loader) for _ in range(args.iters)]
    loader.close()

    def lr_at(it):
        return float(warmup_cosine_lr(jnp.asarray(it), max_lr=optim.max_lr,
                                      warmup_iters=optim.warmup_iters,
                                      total_iters=optim.total_iters,
                                      min_lr=optim.min_lr))

    sidecar = os.path.join(
        args.out, f"dual_stack_parity_init{args.init_seed}.jax.json")
    if args.stack == "torch":
        # CPU-only process: the JAX half already ran (--stack jax) and left
        # its sidecar; never claims the TPU.
        with open(sidecar) as f:
            side = json.load(f)
        j_losses = side["jax_losses"]
        j_ckpts = {int(k): v for k, v in side["jax_ckpts"].items()}
        j_raw_cer = side["jax_raw_cer"]
        jax_backend_used = side.get("jax_backend", "cpu")
    else:
        # ---- our stack (runs first: ~5-10x faster; aborts the run before
        # the torch cost is paid if the recipe never exits collapse) ----
        model = HTRVT(cfg.model)
        tx_opt = make_base_optimizer(cfg.optim)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=stats, opt_state=tx_opt.init(params),
                           ema_params=jax.tree.map(jnp.copy, params),
                           ema_batch_stats=jax.tree.map(jnp.copy, stats),
                           rng=jax.random.PRNGKey(0))
        step_fn = jit_train_step(model, cfg, donate=False)
        eval_fn = jit_eval_step(model, cfg)

        def jax_cer(ema_params, ema_stats):
            m = RecognitionMetrics()
            for batch, valid, texts in eval_batches(val_ds, converter, args.bs,
                                                    max_label_len):
                out = eval_fn(ema_params, ema_stats,
                              {k: jnp.asarray(v) for k, v in batch.items()})
                preds = converter.decode_batch(
                    np.asarray(out["pred_ids"])[:valid])
                m.update(preds, texts)
            return m.cer, m.wer

        j_losses, j_ckpts = [], {}
        t0 = time.time()
        for it, b in enumerate(batches):
            state, metrics = step_fn(state, {
                "image": jnp.asarray(b["image"]),
                "labels": jnp.asarray(b["labels"]),
                "label_lengths": jnp.asarray(b["label_lengths"])})
            j_losses.append(float(metrics["loss"]))
            if (it + 1) in ckpt_iters:
                cer, wer = jax_cer(state.ema_params, state.ema_batch_stats)
                j_ckpts[it + 1] = {"cer": round(cer, 4), "wer": round(wer, 4)}
                print(f"[jax] ckpt iter {it+1}: CER {cer:.4f} WER {wer:.4f}",
                      flush=True)
            if (it + 1) % 50 == 0:
                print(f"[jax] iter {it+1}/{args.iters} loss "
                      f"{j_losses[-1]:.4f} ({time.time()-t0:.0f}s)",
                      flush=True)
        j_raw_cer, _ = jax_cer(state.params, state.batch_stats)
        jax_backend_used = jax.default_backend()
        print(f"[jax] final raw-weights CER {j_raw_cer:.4f}", flush=True)

        if args.pilot:
            print(json.dumps({"pilot": True, "jax_ckpts": j_ckpts,
                              "jax_raw_cer": round(j_raw_cer, 4)}, indent=2))
            return
        if j_ckpts[max(ckpt_iters)]["cer"] >= 0.9:
            print("ABORT: JAX stack never exited blank-collapse under this "
                  "recipe; not paying for the torch half. Raise --iters or "
                  "ease the task.")
            sys.exit(1)
        if args.stack == "jax":
            os.makedirs(args.out, exist_ok=True)
            with open(sidecar, "w") as f:
                json.dump({"init_seed": args.init_seed, "seed": args.seed,
                           "jax_backend": jax.default_backend(),
                           "jax_ckpts": j_ckpts,
                           "jax_raw_cer": round(j_raw_cer, 4),
                           "jax_losses": [round(x, 4) for x in j_losses]},
                          f, indent=1)
            print(f"wrote {sidecar}")
            return

    # ---- torch stack: the reference's literal step order ------------------
    tsam = ref_sam.SAM(tmodel.parameters(), torch.optim.AdamW, rho=optim.sam_rho,
                       lr=1e-7, betas=(0.9, 0.99), weight_decay=optim.weight_decay)
    criterion = torch.nn.CTCLoss(reduction="none", zero_infinity=True)
    ema_sd = {k: v.detach().clone().float() for k, v in tmodel.state_dict().items()}

    def t_loss(b):
        x = torch.from_numpy(b["image"]).permute(0, 3, 1, 2)
        preds = tmodel(x)
        logp = preds.permute(1, 0, 2).log_softmax(2)
        lens = torch.from_numpy(b["label_lengths"]).long()
        targets = torch.from_numpy(np.concatenate(
            [b["labels"][i, :b["label_lengths"][i]]
             for i in range(len(lens))]))
        in_lens = torch.full((len(lens),), T, dtype=torch.long)
        loss = criterion(logp, targets, in_lens, lens).mean()
        return loss + 0.0 * tmodel.mask_token.sum()

    def torch_cer(state_dict):
        te = ref_htr_vt.create_model(nb_cls=nb_cls, img_size=[H, W])
        te.load_state_dict(state_dict)
        te.eval()
        m = RecognitionMetrics()
        with torch.no_grad():
            for batch, valid, texts in eval_batches(val_ds, converter,
                                                    args.bs, max_label_len):
                x = torch.from_numpy(batch["image"]).permute(0, 3, 1, 2)
                preds = te(x)[:valid]
                ids = preds.argmax(-1).numpy()
                m.update(converter.decode_batch(ids), texts)
        return m.cer, m.wer

    t_losses, t_ckpts = [], {}
    t0 = time.time()
    for it, b in enumerate(batches):
        lr = lr_at(it)
        for g in tsam.param_groups:
            g["lr"] = lr
        tsam.zero_grad()
        loss = t_loss(b)
        t_losses.append(float(loss.detach()))
        loss.backward()
        tsam.first_step(zero_grad=True)
        t_loss(b).backward()
        tsam.second_step(zero_grad=True)
        n = it / 2.0
        d = min(optim.ema_decay, (1.0 + n) / (10.0 + n))
        with torch.no_grad():
            for k, v in tmodel.state_dict().items():
                if ema_sd[k].dtype.is_floating_point:
                    ema_sd[k].mul_(d).add_((1.0 - d) * v.float())
        if (it + 1) in ckpt_iters:
            cer, wer = torch_cer(copy.deepcopy(ema_sd))
            t_ckpts[it + 1] = {"cer": round(cer, 4), "wer": round(wer, 4)}
            print(f"[torch] ckpt iter {it+1}: CER {cer:.4f} WER {wer:.4f}",
                  flush=True)
            # Durable partial evidence: the torch half is hours of CPU; any
            # completed checkpoint prefix is already a CER comparison.
            os.makedirs(args.out, exist_ok=True)
            with open(os.path.join(
                    args.out,
                    f"dual_stack_parity_init{args.init_seed}.partial.json"),
                    "w") as f:
                json.dump({"iters_done": it + 1, "torch_ckpts": t_ckpts,
                           "jax_ckpts": j_ckpts}, f, indent=1)
        if (it + 1) % 25 == 0:
            print(f"[torch] iter {it+1}/{args.iters} loss {t_losses[-1]:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    t_raw_cer, _ = torch_cer(
        {k: v.detach().clone() for k, v in tmodel.state_dict().items()})
    print(f"[torch] final raw-weights CER {t_raw_cer:.4f}", flush=True)

    # ---- compare ----------------------------------------------------------
    w = max(args.iters // 8, 10)
    tl, jl = np.asarray(t_losses), np.asarray(j_losses)
    windows = []
    for s in range(0, args.iters - w + 1, w):
        mt, mj = float(tl[s:s + w].mean()), float(jl[s:s + w].mean())
        windows.append({"start": s, "torch": round(mt, 4), "jax": round(mj, 4),
                        "rel": round(abs(mt - mj) / max(abs(mt), 1e-9), 4)})
    max_rel = max(x["rel"] for x in windows)

    last = max(ckpt_iters)
    checkpoints = [{"iter": it,
                    "torch": t_ckpts[it], "jax": j_ckpts[it],
                    "cer_abs_diff": round(abs(t_ckpts[it]["cer"] -
                                              j_ckpts[it]["cer"]), 4)}
                   for it in ckpt_iters]
    result = {
        "iters": args.iters, "bs": args.bs, "img": [H, W], "nb_cls": nb_cls,
        "seed": args.seed, "init_seed": args.init_seed,
        "jax_backend": jax_backend_used,
        "alphabet": args.alphabet,
        "label_len": [args.min_len, args.max_len],
        "glyph_scale": list(scale),
        "recipe": ("SAM(AdamW) lr-cos wd=0.5 rho=0.05 EMA, masking off, "
                   + ("augment off" if args.no_augment else "augment on")),
        "loss_windows": windows,
        "max_windowed_rel_diff": max_rel,
        "checkpoints": checkpoints,
        "torch": {"final_loss_window": windows[-1]["torch"],
                  "cer": t_ckpts[last]["cer"], "wer": t_ckpts[last]["wer"],
                  "raw_cer": round(t_raw_cer, 4)},
        "jax": {"final_loss_window": windows[-1]["jax"],
                "cer": j_ckpts[last]["cer"], "wer": j_ckpts[last]["wer"],
                "raw_cer": round(j_raw_cer, 4)},
        "cer_abs_diff": round(abs(t_ckpts[last]["cer"] -
                                  j_ckpts[last]["cer"]), 4),
        "contract": {"both_below_0.5": bool(t_ckpts[last]["cer"] < 0.5
                                            and j_ckpts[last]["cer"] < 0.5),
                     "agree_within_0.1": bool(abs(t_ckpts[last]["cer"] -
                                                  j_ckpts[last]["cer"]) <= 0.1)},
        "torch_losses": [round(x, 4) for x in t_losses],
        "jax_losses": [round(x, 4) for x in j_losses],
    }
    os.makedirs(args.out, exist_ok=True)
    name = ("dual_stack_parity.json" if args.init_seed == args.seed
            else f"dual_stack_parity_init{args.init_seed}.json")
    path = os.path.join(args.out, name)
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ("torch_losses", "jax_losses",
                                   "loss_windows")}, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
