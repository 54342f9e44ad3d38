"""HBM footprint report for the training step's memory levers.

AOT-compiles (lower -> compile, no execution) the full jitted SAM step at the
flagship shapes under each remat / grad_accum setting and prints XLA's
memory_analysis(): temp (activation) bytes, argument/output bytes, and the
peak the program would reserve. Evidence for the --remat / --grad-accum
flags' purpose: the reference stack has no such levers (it holds every
activation; README.md:38 caps it at a 24 GB GPU).

Runs against whatever backend JAX resolves (TPU when the tunnel is up;
`JAX_PLATFORMS=cpu` works too, with host-memory numbers). Compilation only —
safe to run while another process owns the chip's cores.

Usage: python tools/memory_report.py [--bs 128] [--encoder vit]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--encoder", type=str, default="vit")
    ap.add_argument("--img-w", type=int, default=512)
    args = ap.parse_args()

    import jax
    import numpy as np

    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from htr_vt_tpu.config import (ExperimentConfig, MaskConfig, ModelConfig,
                                   OptimConfig, TrainConfig)
    from htr_vt_tpu.models.htr_vt import build_model
    from htr_vt_tpu.train.state import create_train_state
    from htr_vt_tpu.train.step import jit_train_step

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.random((args.bs, 64, args.img_w, 1), dtype=np.float32),
        "labels": rng.integers(1, 80, (args.bs, 96)).astype(np.int32),
        "label_lengths": rng.integers(30, 90, (args.bs,)).astype(np.int32),
    }

    def build(remat: str, accum: int):
        cfg = ExperimentConfig(
            model=ModelConfig(nb_cls=80, encoder=args.encoder, remat=remat,
                              img_size=(64, args.img_w),
                              masking=MaskConfig(mode="span", ratio=0.4,
                                                 max_span_length=8)),
            optim=OptimConfig(),
            train=TrainConfig(grad_accum=accum))
        model = build_model(cfg.model)
        state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   np.zeros_like(batch["image"][:1]))
        fn = jit_train_step(model, cfg, donate=True)
        return fn, state

    rows = []
    for remat, accum in [("none", 1), ("blocks", 1), ("all", 1),
                         ("none", 2), ("none", 4), ("all", 4)]:
        fn, state = build(remat, accum)
        compiled = fn.lower(state, batch).compile()
        m = compiled.memory_analysis()
        row = {
            "remat": remat, "grad_accum": accum,
            "temp_MB": round(m.temp_size_in_bytes / 2**20, 1),
            "args_MB": round(m.argument_size_in_bytes / 2**20, 1),
            "output_MB": round(m.output_size_in_bytes / 2**20, 1),
            "alias_MB": round(m.alias_size_in_bytes / 2**20, 1),
            "gen_code_MB": round(m.generated_code_size_in_bytes / 2**20, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = rows[0]["temp_MB"]
    for r in rows[1:]:
        print(f"# remat={r['remat']} accum={r['grad_accum']}: temp "
              f"{r['temp_MB']} MB = {r['temp_MB'] / base:.2f}x of baseline")


if __name__ == "__main__":
    main()
