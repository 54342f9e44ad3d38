"""Evaluation with CTC beam search + n-gram LM rescoring.

Mirrors model_window/test_with_kenlm.py: per sample, run a beam search over
the log-probs, collapse candidates to text, rescore with an ARPA LM and pick
the best; report CER/WER and write ``kenlm_correction_results.json``.

Two correctness upgrades over the reference, both flag-gated off for parity:
- ``--proper-beam`` uses prefix-merging beam search instead of the naive
  frame-wise top-k (reference :25-43);
- CER here is aggregated per character (the reference divides by *batch
  count*, a bug flagged in SURVEY §2.3 — not replicated).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from htr_vt_tpu.cli.args import args_to_config, build_parser
from htr_vt_tpu.data.loader import build_dataset, choose_max_label_len, eval_batches, make_converter
from htr_vt_tpu.decode.beam import (collapse_sequence,
                                    prefix_beam_search_batch,
                                    simple_beam_search_batch)
from htr_vt_tpu.decode.lm import NgramScorer, rescore_candidates
from htr_vt_tpu.models.htr_vt import build_model
from htr_vt_tpu.text.metrics import RecognitionMetrics
from htr_vt_tpu.train.checkpoint import CheckpointManager
from htr_vt_tpu.train.state import create_train_state
from htr_vt_tpu.train.step import jit_eval_step


def main() -> None:
    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    parser = build_parser("htr_vt_tpu LM-rescored evaluator")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--arpa", type=str, required=True,
                        help="n-gram LM: ARPA TEXT (train one with "
                             "decode/lm_train.py, or kenlm's lmplz -o N) or "
                             "this framework's compiled .htlm binary "
                             "(python -m htr_vt_tpu.decode.lm_compile; "
                             "bit-identical scores, faster load). "
                             "kenlm's own compiled .binary/.klm files are "
                             "NOT supported — re-export ARPA and compile")
    parser.add_argument("--beam-width", type=int, default=5)
    parser.add_argument("--lm-weight", type=float, default=1.0)
    parser.add_argument("--ctc-weight", type=float, default=0.0)
    parser.add_argument("--proper-beam", action="store_true", default=False)
    parser.add_argument("--char-lm", action="store_true", default=False,
                        help="ARPA is character-level (tokens = chars, <sp> for space)")
    parser.add_argument("--lm-in-beam", action="store_true", default=False,
                        help="fuse the (char-level) LM into the prefix beam "
                             "search itself instead of rescoring finished "
                             "candidates; implies --proper-beam --char-lm")
    parser.add_argument("--split", type=str, default="test", choices=["val", "test"])
    parser.add_argument("--results-out", type=str, default=None)
    args = parser.parse_args()
    cfg = args_to_config(args)

    train_ds = build_dataset(cfg.data, "train")
    eval_ds = build_dataset(cfg.data, args.split)
    converter = make_converter(cfg.data, train_ds)
    import dataclasses
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, nb_cls=converter.num_classes))
    model = build_model(cfg.model)
    max_label_len = choose_max_label_len(train_ds.labels, cfg.model.num_tokens)

    sample = np.zeros((cfg.data.val_bs, *cfg.model.img_size, 1), np.float32)
    template = create_train_state(cfg, model, jax.random.PRNGKey(0), sample)
    ckpt = CheckpointManager(os.path.dirname(args.checkpoint.rstrip("/")) or ".")
    state, _ = ckpt.restore(args.checkpoint, template)
    eval_fn = jit_eval_step(model, cfg)
    scorer = NgramScorer(args.arpa)
    if args.lm_in_beam:
        args.proper_beam = args.char_lm = True
    if args.char_lm:
        from htr_vt_tpu.decode.lm_train import chars_for_lm
        base_score = scorer.score
        scorer.score = lambda text: base_score(chars_for_lm(text))

    indexed_lm, lm_lut = None, None
    if args.lm_in_beam:
        # LM tokens per CTC class: chars, space as <sp> (decode/lm_train.py)
        vocab = ["<sp>" if ch == " " else ch
                 for ch in converter.character[1:]]
        indexed_lm = scorer.indexed(vocab)
        lm_lut = np.concatenate([[-1], np.arange(len(vocab))]).astype(np.int32)

    def ids_to_text(ids) -> str:
        return "".join(converter.character[i] for i in ids
                       if 0 < i < len(converter.character))

    import time
    metrics, greedy_metrics = RecognitionMetrics(), RecognitionMetrics()
    records = []
    n_images, decode_secs, t_start = 0, 0.0, time.perf_counter()
    for batch, valid, texts in eval_batches(eval_ds, converter, cfg.data.val_bs,
                                            max_label_len):
        out = eval_fn(state.ema_params, state.ema_batch_stats, batch)
        logp = jax.nn.log_softmax(out["logits"], axis=-1)
        logp = np.asarray(logp)[:valid]
        greedy = converter.decode_batch(np.asarray(out["pred_ids"])[:valid])
        t0 = time.perf_counter()
        if args.proper_beam:
            batch_beams = prefix_beam_search_batch(
                logp, beam_width=args.beam_width,
                lm=indexed_lm, lm_weight=args.lm_weight if args.lm_in_beam else 0.0,
                lm_id_of_class=lm_lut)
        else:
            batch_beams = simple_beam_search_batch(
                logp, beam_width=args.beam_width, top_k_per_frame=args.beam_width)
        decode_secs += time.perf_counter() - t0
        n_images += valid
        for bi, (lp, gt, gr) in enumerate(zip(logp, texts, greedy)):
            if args.proper_beam:
                cands = [(ids_to_text(seq), score)
                         for seq, score in batch_beams[bi]]
            else:
                cands = [(ids_to_text(collapse_sequence(seq)), score)
                         for seq, score in batch_beams[bi]]
            if args.lm_in_beam:
                # the LM already shaped the beam; take its top hypothesis
                best = cands[0][0] if cands else ""
            else:
                best = rescore_candidates(cands, scorer, args.lm_weight,
                                          args.ctc_weight)[0][0] if cands else ""
            metrics.update([best], [gt])
            greedy_metrics.update([gr], [gt])
            records.append({"ground_truth": gt, "greedy": gr, "lm_best": best,
                            "candidates": [c for c, _ in cands]})
    total_secs = time.perf_counter() - t_start

    print(f"greedy  CER {greedy_metrics.cer:.4f}  WER {greedy_metrics.wer:.4f}")
    print(f"LM-beam CER {metrics.cer:.4f}  WER {metrics.wer:.4f}")
    print(f"{n_images} images: beam+LM decode {decode_secs:.2f}s "
          f"({n_images / max(decode_secs, 1e-9):.0f} img/s), "
          f"end-to-end {total_secs:.2f}s "
          f"({n_images / max(total_secs, 1e-9):.0f} img/s)")
    out_path = args.results_out or os.path.join(
        cfg.train.out_dir, cfg.train.exp_name, "kenlm_correction_results.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump({"cer": metrics.cer, "wer": metrics.wer,
                   "greedy_cer": greedy_metrics.cer,
                   "greedy_wer": greedy_metrics.wer,
                   "n_images": n_images,
                   "decode_secs": round(decode_secs, 3),
                   "decode_img_per_sec": round(n_images / max(decode_secs, 1e-9), 1),
                   "total_secs": round(total_secs, 3),
                   "samples": records}, f, indent=2, ensure_ascii=False)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
