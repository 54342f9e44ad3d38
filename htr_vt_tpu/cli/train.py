"""Training entry point: ``python -m htr_vt_tpu.cli.train [IAM|READ|LAM|SYNTH] <flags>``.

Replaces the per-variant train.py scripts; variants are --encoder/--mask-mode/
--sgm-* / --tri-masked flags over one trainer.
"""

from __future__ import annotations

from htr_vt_tpu.cli.args import args_to_config, build_parser
from htr_vt_tpu.train.loop import fit


def main() -> None:
    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    args = build_parser("htr_vt_tpu trainer").parse_args()
    cfg = args_to_config(args)
    result = fit(cfg)
    print(f"done: best CER {result['best_cer']:.4f} best WER {result['best_wer']:.4f}")


if __name__ == "__main__":
    main()
