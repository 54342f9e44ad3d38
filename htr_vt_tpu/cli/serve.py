"""Batch serving: transcribe a directory (or list) of line images.

Production-style inference path: fixed-shape batching onto the chip, greedy
decode on device, optional beam + ARPA-LM rescoring on host. Emits JSONL
(one {"image", "text"} record per line) to stdout or --out.

    python -m htr_vt_tpu.cli.serve IAM --checkpoint out/iam/best_CER \
        --images 'scans/*.png' --batch-size 64 [--arpa lm.arpa]

Width buckets (--width-buckets 512,1024,2048): the reference hard-caps every
line at W=512 (data/dataset.py:104-111), truncating very long lines. With
buckets, each image is routed by its natural aspect-resized width to the
smallest bucket that holds it and runs through ONE compiled program per
bucket (static shapes stay static — no recompile storm), so long lines keep
their full width. The shared parameters are shape-independent (convs, LN,
arbitrary-N attention) and the sin-cos positional embedding extends
analytically to the wider grid; lines wider than the largest bucket are
capped there, generalizing the reference's 512 behavior.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import jax
import numpy as np

from htr_vt_tpu.cli.args import args_to_config, build_parser
from htr_vt_tpu.data.image import load_line_image
from htr_vt_tpu.data.loader import build_dataset, make_converter
from htr_vt_tpu.models.htr_vt import build_model
from htr_vt_tpu.train.checkpoint import CheckpointManager
from htr_vt_tpu.train.state import create_train_state
from htr_vt_tpu.train.step import jit_eval_step


def main() -> None:
    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    parser = build_parser("htr_vt_tpu batch transcription")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--images", type=str, default=None,
                        help="glob pattern or file containing one path per line")
    parser.add_argument("--selftest", action="store_true",
                        help="serve self-generated synthetic lines at natural "
                             "widths instead of --images and score the "
                             "transcriptions (smoke-tests a checkpoint + "
                             "bucket config without data)")
    parser.add_argument("--selftest-n", type=int, default=16)
    parser.add_argument("--selftest-max-chars", type=int, default=96,
                        help="cap the selftest length ramp (default 6..96 "
                             "chars); set to the trained recipe's max line "
                             "length to score the in-distribution workload "
                             "separately from the beyond-range one")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--arpa", type=str, default=None,
                        help="optional n-gram LM for beam rescoring: ARPA "
                             "text or compiled .htlm "
                             "(htr_vt_tpu.decode.lm_compile)")
    parser.add_argument("--beam-width", type=int, default=5)
    parser.add_argument("--lm-weight", type=float, default=1.0)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--calib-batches", type=int, default=4,
                        help="int8: batches per bucket folded into the "
                             "running-abs-max activation calibration")
    parser.add_argument("--width-buckets", type=str, default=None,
                        help="comma-separated widths (e.g. 512,1024,2048), "
                             "each a multiple of the stem's width stride "
                             "(patch_size[0], default 4; off-multiples are "
                             "rounded up); default: the training width only")
    args = parser.parse_args()
    cfg = args_to_config(args)

    selftest_labels = {}
    if args.selftest:
        # Self-generated lines with NATURAL widths (length-proportional
        # canvases, labels trimmed to what actually rendered) so bucket
        # routing and long-line handling are exercised end to end.
        import tempfile

        from PIL import Image

        from htr_vt_tpu.data.synthetic import (random_text, render_line,
                                               selftest_canvas_width,
                                               selftest_max_len)
        sdir = tempfile.mkdtemp(prefix="htrvt_selftest_")
        srng = np.random.default_rng(0)
        alphabet = cfg.data.synth_alphabet
        paths = []
        for i in range(args.selftest_n):
            text = random_text(srng, alphabet, min_len=4,
                               max_len=min(args.selftest_max_chars,
                                           selftest_max_len(i, args.selftest_n)))
            w = selftest_canvas_width(len(text))
            img, drawn = render_line(text, 64, w, rng=srng, return_drawn=True)
            p = os.path.join(sdir, f"line_{i:03d}.png")
            Image.fromarray(img).save(p)
            paths.append(p)
            selftest_labels[p] = text[:drawn].rstrip()
    elif args.images:
        if os.path.isfile(args.images) and not args.images.endswith((".png", ".jpg")):
            with open(args.images) as f:
                paths = [l.strip() for l in f if l.strip()]
        else:
            paths = sorted(glob.glob(args.images))
        if not paths:
            sys.exit(f"no images match {args.images!r}")
    else:
        parser.error("one of --images / --selftest is required")

    train_ds = build_dataset(cfg.data, "train")
    converter = make_converter(cfg.data, train_ds)
    import dataclasses
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, nb_cls=converter.num_classes))
    # Checkpoints are stored at the training widths (192-ch stage1); the
    # restore template must match them, so build it pad-free and adapt the
    # trees afterwards (ops/quant.py:serving_arrays).
    tmpl_cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, quant_stage1_pad=0))
    model = build_model(tmpl_cfg.model)
    bs = args.batch_size
    sample = np.zeros((bs, *cfg.model.img_size, 1), np.float32)
    template = create_train_state(tmpl_cfg, model, jax.random.PRNGKey(0), sample)
    ckpt = CheckpointManager(os.path.dirname(args.checkpoint.rstrip("/")) or ".")
    state, _ = ckpt.restore(args.checkpoint, template)
    from htr_vt_tpu.ops.quant import serving_arrays
    sparams, sstats = serving_arrays(cfg.model, state.ema_params,
                                     state.ema_batch_stats)

    scorer = None
    if args.arpa:
        from htr_vt_tpu.decode.lm import NgramScorer
        scorer = NgramScorer(args.arpa)

    h, base_w = cfg.model.img_size

    # Route images to width buckets; one compiled eval program per bucket.
    if args.width_buckets:
        from htr_vt_tpu.data.image import assign_width_buckets, natural_line_width
        req = [int(x) for x in args.width_buckets.split(",") if x.strip()]
        # The stem collapses width by patch_size[0] (two (2,2) stages);
        # off-multiple widths would fail deep inside the model with an
        # opaque reshape error — round them up here instead.
        mult = cfg.model.patch_size[0]
        fixed = [-(-w // mult) * mult for w in req]
        for w, fw in zip(req, fixed):
            if w != fw:
                print(f"width bucket {w} rounded up to {fw} "
                      f"(widths must be multiples of {mult})")
        req = fixed
        widths = [natural_line_width(p, h) for p in paths]
        buckets, owner = assign_width_buckets(widths, req)
    else:
        buckets, owner = [base_w], [0] * len(paths)

    eval_fns = {}

    def eval_for(width, calib_images):
        """Per-width compiled eval fn; with --quant int8 the first batches of
        the bucket calibrate the static activation scales (running abs-max
        over up to --calib-batches float forwards — a single batch can
        under-estimate the scale and silently clip later activations), then
        the fused int8 program serves the bucket."""
        if width not in eval_fns:
            cfg_b = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, img_size=(h, width)))
            model_b = build_model(cfg_b.model)
            extra = None
            if cfg.model.quant == "int8":
                from htr_vt_tpu.ops.quant import calibrate_quant_stats

                def calib_batches():
                    yield calib_images
                    bi = buckets.index(width)
                    bpaths = [paths[i] for i, o in enumerate(owner) if o == bi]
                    for s in range(bs, min(len(bpaths),
                                           args.calib_batches * bs), bs):
                        yield load_chunk(bpaths[s:s + bs], width)

                extra = {"quant_stats": calibrate_quant_stats(
                    model_b,
                    {"params": sparams, "batch_stats": sstats},
                    calib_batches(), n_batches=args.calib_batches)}
            eval_fns[width] = jit_eval_step(model_b, cfg_b, extra_vars=extra)
        return eval_fns[width]

    # Host-side image decode is pipelined: per-image PIL decode+resize costs
    # ~2-5 ms, so an un-overlapped bs-128 batch spends more time in PIL than
    # on the chip. A thread pool decodes images in parallel AND prefetches
    # the next chunk while the current one computes (the jit dispatch
    # releases the GIL during device execution).
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=min(16, os.cpu_count() or 8))
    prefetcher = ThreadPoolExecutor(max_workers=1)  # separate: load_chunk
    # itself fans out on `pool`; sharing one pool could self-deadlock.

    def load_chunk(chunk, width):
        imgs = np.stack(list(pool.map(
            lambda p: load_line_image(p, width, h), chunk)))
        if len(chunk) < bs:  # pad to the compiled shape
            imgs = np.concatenate([imgs, np.ones((bs - len(chunk), h, width, 1),
                                                 np.float32)])
        return imgs

    def transcribe(chunk, width, imgs):
        batch = {"image": imgs, "labels": np.zeros((bs, 8), np.int32),
                 "label_lengths": np.zeros((bs,), np.int32)}
        out = eval_for(width, imgs)(sparams, sstats, batch)
        texts = converter.decode_batch(np.asarray(out["pred_ids"])[:len(chunk)])
        if scorer is not None:
            from htr_vt_tpu.decode.beam import prefix_beam_search
            from htr_vt_tpu.decode.lm import rescore_candidates
            logp = np.asarray(jax.nn.log_softmax(out["logits"], -1))[:len(chunk)]
            rescored = []
            for lp, greedy in zip(logp, texts):
                beams = prefix_beam_search(lp, beam_width=args.beam_width)
                cands = [("".join(converter.character[i] for i in seq
                                  if 0 < i < len(converter.character)), s)
                         for seq, s in beams] or [(greedy, 0.0)]
                rescored.append(rescore_candidates(cands, scorer,
                                                   args.lm_weight)[0][0])
            texts = rescored
        return texts

    sink = open(args.out, "w") if args.out else sys.stdout
    t0 = time.perf_counter()
    results = {}
    # Flatten the whole job into (width, selection) chunks, then run with
    # one-chunk-ahead prefetch: chunk k+1 decodes on host threads while
    # chunk k executes on device.
    jobs = []
    for bi, width in enumerate(buckets):
        idxs = [i for i, o in enumerate(owner) if o == bi]
        for start in range(0, len(idxs), bs):
            jobs.append((width, idxs[start:start + bs]))
    pending = None
    for k, (width, sel) in enumerate(jobs):
        imgs = (pending.result() if pending is not None
                else load_chunk([paths[i] for i in sel], width))
        if k + 1 < len(jobs):
            nw, nsel = jobs[k + 1]
            pending = prefetcher.submit(load_chunk, [paths[i] for i in nsel], nw)
        else:
            pending = None
        for i, t in zip(sel, transcribe([paths[i] for i in sel], width, imgs)):
            results[i] = t
    for i, p in enumerate(paths):  # input order, regardless of bucket
        sink.write(json.dumps({"image": p, "text": results[i]},
                              ensure_ascii=False) + "\n")
    done = len(paths)
    dt = time.perf_counter() - t0
    print(f"# {done} images in {dt:.2f}s ({done / dt:.1f} img/s)", file=sys.stderr)
    if args.out:
        sink.close()

    if args.selftest:
        from htr_vt_tpu.text.metrics import cer_wer
        overall = cer_wer([results[i] for i in range(done)],
                          [selftest_labels[p] for p in paths])
        print(f"# selftest CER {overall[0]:.4f} WER {overall[1]:.4f}",
              file=sys.stderr)
        for bi, width in enumerate(buckets):
            idxs = [i for i, o in enumerate(owner) if o == bi]
            if not idxs:
                continue
            c, w_ = cer_wer([results[i] for i in idxs],
                            [selftest_labels[paths[i]] for i in idxs])
            print(f"#   bucket {width:5d}: {len(idxs):3d} lines  "
                  f"CER {c:.4f}  WER {w_:.4f}", file=sys.stderr)


if __name__ == "__main__":
    main()
