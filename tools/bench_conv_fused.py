"""Benchmark the Pallas fused conv (ops/conv_fused.py) against XLA on the
stem's real shapes, via the hardware profiler (wall timing is unreliable
through the axon tunnel)."""

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

    from htr_vt_tpu.ops.conv_fused import (conv3x3_bn_relu,
                                           conv3x3_bn_relu_reference)

    rng = np.random.default_rng(0)
    PEAK = 197e12
    shapes = [
        ("stage1 s1 192", 128, 8, 512, 192, 192, (1, 1)),
        ("stage2 s1 384", 128, 4, 256, 384, 384, (1, 1)),
        ("stage3 s1 768", 128, 2, 128, 768, 768, (1, 1)),
    ]

    fns = []
    args = []
    for name, B, H, W, Ci, Co, st in shapes:
        x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.05,
                        jnp.bfloat16)
        s = jnp.asarray(rng.standard_normal(Ci), jnp.float32)
        h = jnp.asarray(rng.standard_normal(Ci), jnp.float32)

        pallas_fn = jax.jit(lambda x, k, s, h, st=st: jnp.sum(
            conv3x3_bn_relu(x, k, s, h, strides=st).astype(jnp.float32)))
        xla_fn = jax.jit(lambda x, k, s, h, st=st: jnp.sum(
            conv3x3_bn_relu_reference(x, k, s, h, strides=st)
            .astype(jnp.float32)))
        # correctness first
        got = float(pallas_fn(x, k, s, h))
        want = float(xla_fn(x, k, s, h))
        rel = abs(got - want) / (abs(want) + 1e-9)
        flops = 2 * B * (H // st[0]) * (W // st[1]) * Ci * Co * 9
        print(f"{name:28s} checksum rel diff {rel:.2e}  ({flops/1e9:.0f} GFLOP)")
        fns.append((name, pallas_fn, xla_fn, flops))
        args.append((x, k, s, h))

    trace_dir = "/tmp/htrvt_trace_convfused"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for (name, pf, xf, _), a in zip(fns, args):
            for _ in range(10):
                r1 = pf(*a)
            _ = float(r1)
            for _ in range(10):
                r2 = xf(*a)
            _ = float(r2)

    # parse: pallas kernels appear as custom-call/fusion named with the kernel
    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    xplane = max(xplanes, key=os.path.getmtime)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_step import report
    report(xplane, 10, 40)
    total_flops = sum(f for _, _, _, f in fns)
    print(f"\nper-shape FLOPs above; peak {PEAK/1e12:.0f} TF/s; "
          f"ideal ms per 10-iter group = {[round(f*10/PEAK*1e3,2) for *_ , f in fns]}")


if __name__ == "__main__":
    main()
