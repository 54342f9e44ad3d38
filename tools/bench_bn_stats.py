"""Microbench: one-pass Pallas BN-stats reduce vs XLA's mean/mean-sq fusion.

Round-2 verdict #2 hypothesis: a stats-only Pallas kernel avoids the
layout-copy tax (it emits [C]-shaped outputs, not tensors) and can beat
XLA's two-output reduce fusion for the train-BN stats pass over the stem
activations. ops/bn_stats.py implements it; this tool measures both at the
real stem shapes (bs 128, 64x512 input), standalone (pure reduce, no
producer to fuse into — the in-model case has the producer conv upstream,
so the whole-step A/B in bench.py HTRVT_BN_STATS_IMPL=pallas|xla is the
deciding number; this one attributes it).

Run on a TPU host: `python tools/bench_bn_stats.py`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from htr_vt_tpu.ops.bn_stats import bn_stats, bn_stats_reference

    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    B = int(os.environ.get("HTRVT_BS", "128"))
    # Stem activation shapes at 64x512 input (models/stem.py strides):
    # conv1 out, stage1, stage2, stage3 (x2 BN sites each in the blocks).
    shapes = [
        ("conv1", (B, 32, 512, 64)),
        ("stage1", (B, 32, 512, 192)),
        ("stage2", (B, 16, 512, 384)),
        ("stage3", (B, 8, 512, 768)),
    ]
    reps = 20
    for name, shape in shapes:
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        xla = jax.jit(lambda a: jnp.add(*[jnp.sum(v)
                                          for v in bn_stats_reference(a)]))
        pls = jax.jit(lambda a: jnp.add(*[jnp.sum(v)
                                          for v in bn_stats(
                                              a, interpret=interpret)]))
        out = {}
        for label, fn in [("xla", xla), ("pallas", pls)]:
            _ = float(fn(x))  # compile; host readback = honest sync
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn(x)
            _ = float(r)
            out[label] = (time.perf_counter() - t0) / reps * 1e3
        gbytes = np.prod(shape) * 2 / 1e9
        # v5e HBM ~ 819 GB/s: one full read is the floor.
        floor = gbytes / 819.0 * 1e3
        print(f"{name:7s} {str(shape):22s} xla {out['xla']:7.3f} ms  "
              f"pallas {out['pallas']:7.3f} ms  hbm-floor {floor:6.3f} ms")


if __name__ == "__main__":
    main()
