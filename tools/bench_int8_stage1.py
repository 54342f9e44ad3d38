"""Probe: can stage1's 192-channel convs profit from int8 via CHANNEL PADDING?

Round-2/3 measurements (docs/PERF.md) showed int8 stage1 at 192 channels is
a wash-to-loss: the 192x9=1728 contraction doesn't tile the int8 MXU's
256-deep pipeline, so the 2x rate never materializes. The untried lever from
the round-2 verdict: pad the channel dim 192 -> 256 with zeros (outputs stay
bit-identical — zero weights in the padded slices contribute nothing), paying
1.33x FLOPs for the 2x int8 rate = a potential net 1.5x on stage1's 9.1 ms.

This microbench measures, at the real stage1 shape [B, 8, 512, C]:
  bf16 @192   (today's serving path)
  int8 @192   (measured loss, re-pinned here)
  int8 @256   (the padding candidate: 1.33x FLOPs)
  bf16 @256   (control: does bf16 also speed up at 256? then it's tiling,
               not int8)

Verdict criterion: int8@256 wall < bf16@192 wall by enough to cover the
one-off pad of the pool output (a [B,16,512,64]->... no: padding happens on
the conv1 weights' OUTPUT channels at load time, zero runtime cost for
stage1-internal convs; only the stage1->stage2 boundary conv reads 256
instead of 192, also free).
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

    from htr_vt_tpu.ops.quant import conv_int8

    rng = np.random.default_rng(0)
    B, H, W = 128, 8, 512
    cases = []

    def case(name, Ci, Co, kind):
        x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.05,
                        jnp.bfloat16)
        # optimization_barrier between the conv and the reduce: without it
        # XLA strength-reduces sum(conv(x, w)) into a cheap scalar fusion
        # and the "conv" timings are fiction (round-5 finding: the round-4
        # numbers from this tool measured a reduce, not the conv; the
        # in-model bench_infer measurements are authoritative).
        if kind == "bf16":
            fn = jax.jit(lambda x, w: jnp.sum(jax.lax.optimization_barrier(
                jax.lax.conv_general_dilated(
                    x, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC")))
                .astype(jnp.float32)))
        else:
            fn = jax.jit(lambda x, w: jnp.sum(
                jax.lax.optimization_barrier(conv_int8(x, w))))
        flops = 2 * B * H * W * Ci * Co * 9
        cases.append((name, fn, (x, w), flops))

    case("bf16 192", 192, 192, "bf16")
    case("int8 192", 192, 192, "int8")
    case("bf16 256", 256, 256, "bf16")
    case("int8 256", 256, 256, "int8")

    for name, fn, args, flops in cases:
        _ = float(fn(*args))  # compile + sanity

    trace_dir = "/tmp/htrvt_trace_int8_s1"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for name, fn, args, flops in cases:
            for _ in range(10):
                r = fn(*args)
            _ = float(r)

    xplane = max(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True),
                 key=os.path.getmtime)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_step import report
    report(xplane, 10, 40)
    print("\nideal ms per 10-iter group (197 bf16 TF/s; int8 2x):",
          {name: round(f * 10 / 197e12 * 1e3 / (2 if "int8" in name else 1), 2)
           for name, _, _, f in cases})


if __name__ == "__main__":
    main()
