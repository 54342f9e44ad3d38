"""Export a trained checkpoint as a self-contained StableHLO serving bundle.

    python -m htr_vt_tpu.cli.export IAM --checkpoint out/iam/best_CER \
        --out out/iam/bundle [--width-buckets 512,1024] [--quant int8] \
        [--batch-size 64] [--verify]

The bundle (htr_vt_tpu/deploy.py) bakes the EMA weights into one StableHLO
program per serving width; loading it needs jax + meta.json only, no model
code. With ``--quant int8`` the activation scales are calibrated over
``--calib-batches`` eval batches first (same running-abs-max scheme as
cli/test.py), then the fused int8 program is what gets exported.

The reference ships no export path at all — its serving story is importing
the full torch source tree (model_window/quick_inference.py:16-100).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from htr_vt_tpu.cli.args import args_to_config, build_parser
from htr_vt_tpu.data.loader import build_dataset, choose_max_label_len, \
    eval_batches, make_converter
from htr_vt_tpu.deploy import ServingBundle, export_serving, save_bundle
from htr_vt_tpu.models.htr_vt import build_model
from htr_vt_tpu.train.checkpoint import CheckpointManager
from htr_vt_tpu.train.state import create_train_state


def main() -> None:
    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    parser = build_parser("htr_vt_tpu StableHLO serving export")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--out", type=str, required=True,
                        help="bundle output directory")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--width-buckets", type=str, default=None,
                        help="comma-separated serving widths; default: the "
                             "training width (off-multiples round up like "
                             "cli/serve.py)")
    parser.add_argument("--platforms", type=str, default=None,
                        help="comma-separated lowering targets (default: "
                             "current backend + cpu)")
    parser.add_argument("--calib-batches", type=int, default=4)
    parser.add_argument("--verify", action="store_true",
                        help="reload each artifact and check it matches the "
                             "live model on random input")
    args = parser.parse_args()
    cfg = args_to_config(args)

    import jax

    train_ds = build_dataset(cfg.data, "train")
    converter = make_converter(cfg.data, train_ds)
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, nb_cls=converter.num_classes))
    model = build_model(cfg.model)
    bs = args.batch_size
    h, base_w = cfg.model.img_size
    # restore through a pad-free template, then adapt (int8 stage1 pad)
    tmpl_cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, quant_stage1_pad=0))
    sample = np.zeros((bs, h, base_w, 1), np.float32)
    template = create_train_state(tmpl_cfg, build_model(tmpl_cfg.model),
                                  jax.random.PRNGKey(0), sample)
    ckpt = CheckpointManager(os.path.dirname(args.checkpoint.rstrip("/")) or ".")
    state, _ = ckpt.restore(args.checkpoint, template)
    from htr_vt_tpu.ops.quant import serving_arrays
    sparams, sstats = serving_arrays(cfg.model, state.ema_params,
                                     state.ema_batch_stats)

    platforms = ([p.strip() for p in args.platforms.split(",") if p.strip()]
                 if args.platforms else None)
    backend = jax.default_backend()
    resolved = platforms or ([backend] if backend == "cpu"
                             else [backend, "cpu"])
    # Pallas kernels (flash attention at N >= 256 under attn_impl="auto")
    # are platform-specific custom calls — a multi-platform artifact must
    # stay on the portable XLA attention. TPU-only exports keep "auto".
    attn_impl = cfg.model.attn_impl if resolved == ["tpu"] else "xla"

    if args.width_buckets:
        mult = cfg.model.patch_size[0]
        widths = sorted({-(-int(w) // mult) * mult
                         for w in args.width_buckets.split(",") if w.strip()})
    else:
        widths = [base_w]

    base_vars = {"params": sparams, "batch_stats": sstats}
    if cfg.model.quant == "int8":
        # Calibrate static activation scales once at the dataset's native
        # width (running abs-max over a few eval batches — see cli/test.py);
        # per-tensor scales are width-independent, so the wider buckets
        # reuse them.
        from htr_vt_tpu.ops.quant import calibrate_quant_stats
        eval_ds = build_dataset(cfg.data, "val")
        max_len = choose_max_label_len(train_ds.labels, cfg.model.num_tokens)
        stats = calibrate_quant_stats(
            model, base_vars,
            (b["image"] for b, _, _ in eval_batches(eval_ds, converter, bs,
                                                    max_len)),
            args.calib_batches)
        base_vars = {**base_vars, "quant_stats": stats}

    artifacts = {}
    for width in widths:
        cfg_b = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, img_size=(h, width),
                                           attn_impl=attn_impl))
        model_b = build_model(cfg_b.model)
        variables = base_vars
        print(f"exporting width {width} (bs {bs}, "
              f"quant {'int8' if cfg.model.quant == 'int8' else 'float'}) ...")
        artifacts[width] = export_serving(model_b, variables, bs, (h, width),
                                          platforms=platforms)

    save_bundle(args.out, artifacts, {
        "charset": converter.character,
        "height": h,
        "batch_size": bs,
        "quant": "int8" if cfg.model.quant == "int8" else "float",
        "checkpoint": os.path.abspath(args.checkpoint),
        "encoder": cfg.model.encoder,
    })
    total = sum(len(v) for v in artifacts.values())
    print(f"bundle written to {args.out} "
          f"({len(artifacts)} artifact(s), {total / 1e6:.1f} MB)")

    if args.verify:
        bundle = ServingBundle(args.out)
        rng = np.random.default_rng(0)
        for width in widths:
            img = rng.standard_normal((bs, h, width, 1)).astype(np.float32)
            ids, lengths = bundle.run(img, width)
            cfg_b = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, img_size=(h, width),
                                               attn_impl=attn_impl))
            model_b = build_model(cfg_b.model)
            from htr_vt_tpu.deploy import make_serving_fn
            ref_ids, ref_len = jax.jit(make_serving_fn(model_b, base_vars))(img)
            ok = (np.array_equal(ids, np.asarray(ref_ids))
                  and np.array_equal(lengths, np.asarray(ref_len)))
            print(f"verify width {width}: "
                  f"{'OK (bit-exact vs live model)' if ok else 'MISMATCH'}")
            if not ok:
                raise SystemExit(1)


if __name__ == "__main__":
    main()
