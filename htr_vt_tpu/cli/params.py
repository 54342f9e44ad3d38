"""Parameter-count audit: per-module breakdown for any encoder config.

Counterpart of the reference's audit tool (model_lgp/print_params.py:16-30).

    python -m htr_vt_tpu.cli.params IAM --encoder lgp [--depth-level 2]
"""

from __future__ import annotations

from collections import defaultdict

import jax
import numpy as np

from htr_vt_tpu.cli.args import args_to_config, build_parser
from htr_vt_tpu.models.htr_vt import build_model


def main() -> None:
    parser = build_parser("htr_vt_tpu parameter audit")
    parser.add_argument("--depth-level", type=int, default=2,
                        help="module-path depth to aggregate at")
    args = parser.parse_args()
    cfg = args_to_config(args).model

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x = np.zeros((1, *cfg.img_size, 1), np.float32)
    init_args = (x, np.zeros((1, cfg.max_seq_len), np.int32)) \
        if cfg.model_type == "encoder_decoder" else (x,)
    variables = model.init({"params": rng, "mask": rng, "dropout": rng}, *init_args)

    groups = defaultdict(int)
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables["params"])[0]:
        names = [str(getattr(k, "key", k)) for k in path]
        key = "/".join(names[:args.depth_level])
        groups[key] += int(leaf.size)
        total += int(leaf.size)

    width = max(len(k) for k in groups)
    for key in sorted(groups, key=groups.get, reverse=True):
        n = groups[key]
        print(f"{key:<{width}}  {n:>12,}  ({100.0 * n / total:5.2f}%)")
    print("-" * (width + 24))
    print(f"{'total':<{width}}  {total:>12,}")


if __name__ == "__main__":
    main()
