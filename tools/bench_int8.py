"""Probe: does XLA on this TPU actually run int8 convs/matmuls at the 2x
MXU rate? Gate for wiring quantized inference (ops/quant.py).

Compares bf16 vs dynamic-int8 at the stem's stage2/3 conv shapes and the
ViT qkv matmul shape, via the hardware profiler.
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from htr_vt_tpu.ops.quant import conv_int8, dot_int8

    rng = np.random.default_rng(0)
    cases = []

    def conv_case(name, B, H, W, Ci, Co):
        x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.05,
                        jnp.bfloat16)
        bf = jax.jit(lambda x, w: jnp.sum(jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(jnp.float32)))
        q8 = jax.jit(lambda x, w: jnp.sum(conv_int8(x, w)))
        flops = 2 * B * H * W * Ci * Co * 9
        cases.append((name, bf, q8, (x, w), flops))

    def dot_case(name, M, K, N):
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.bfloat16)
        bf = jax.jit(lambda x, w: jnp.sum(
            (x @ w).astype(jnp.float32)))
        q8 = jax.jit(lambda x, w: jnp.sum(dot_int8(x, w)))
        cases.append((name, bf, q8, (x, w), 2 * M * K * N))

    conv_case("conv s2 384", 128, 4, 256, 384, 384)
    conv_case("conv s3 768", 128, 2, 128, 768, 768)
    dot_case("qkv 16384x768x2304", 128 * 128, 768, 2304)

    for name, bf, q8, args, flops in cases:
        a = float(bf(*args))
        b = float(q8(*args))
        rel = abs(a - b) / (abs(a) + 1e-9)
        print(f"{name:24s} checksum rel {rel:.3e} ({flops/1e9:.0f} GFLOP)",
              flush=True)

    trace_dir = "/tmp/htrvt_trace_int8"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for name, bf, q8, args, flops in cases:
            for _ in range(10):
                r = bf(*args)
            _ = float(r)
            for _ in range(10):
                r = q8(*args)
            _ = float(r)

    xplane = max(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True),
                 key=os.path.getmtime)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_step import report
    report(xplane, 10, 40)
    print("\nideal bf16 ms per 10-iter group at 197 TF/s:",
          [round(f * 10 / 197e12 * 1e3, 2) for *_, f in cases],
          " int8 at 394 TOPS: half of that")


if __name__ == "__main__":
    main()
