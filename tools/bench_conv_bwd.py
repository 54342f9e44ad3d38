"""Benchmark the Pallas dgrad/wgrad kernels (ops/conv_fused.py backward)
against the XLA linear_transpose backward on the stem's stride-1 shapes,
via the hardware profiler (wall timing is unreliable through axon)."""

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
    shapes = [
        ("stage1 s1 192", 128, 8, 512, 192, 192),
        ("stage2 s1 384", 128, 4, 256, 384, 384),
        ("stage3 s1 768", 128, 2, 128, 768, 768),
    ]

    fns = []
    args = []
    for name, B, H, W, Ci, Co in shapes:
        x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.05,
                        jnp.bfloat16)
        s = jnp.asarray(rng.standard_normal(Ci), jnp.float32)
        h = jnp.asarray(rng.standard_normal(Ci), jnp.float32)

        # RANDOM cotangent fed as a jit input — a constant-ones cotangent (as
        # from grad-of-sum) lets XLA fold/simplify its dgrad and skews the
        # comparison.
        ct = jnp.asarray(rng.standard_normal((B, H, W, Co)), jnp.bfloat16)

        def vjp_sum(conv_fn):
            def f(x, k, s, h, ct):
                _, vjp = jax.vjp(lambda *a: conv_fn(*a), x, k, s, h)
                gx, gk, gs, gh = vjp(ct)
                return (jnp.sum(gx.astype(jnp.float32)) +
                        jnp.sum(gk.astype(jnp.float32)) + jnp.sum(gs) +
                        jnp.sum(gh))
            return jax.jit(f)

        pallas_fn = vjp_sum(conv3x3_bn_relu)
        xla_fn = vjp_sum(conv3x3_bn_relu_reference)
        got = float(pallas_fn(x, k, s, h, ct))
        want = float(xla_fn(x, k, s, h, ct))
        rel = abs(got - want) / (abs(want) + 1e-9)
        # bwd = dgrad + wgrad, each the conv's FLOPs
        flops = 2 * 2 * B * H * W * Ci * Co * 9
        print(f"{name:16s} grad-checksum rel diff {rel:.2e} "
              f"({flops/1e12:.2f} TFLOP bwd)", flush=True)
        fns.append((name, pallas_fn, xla_fn, flops))
        args.append((x, k, s, h, ct))

    trace_dir = "/tmp/htrvt_trace_convbwd"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for (name, pf, xf, _), a in zip(fns, args):
            for _ in range(10):
                r1 = pf(*a)
            _ = float(r1)
            for _ in range(10):
                r2 = xf(*a)
            _ = float(r2)

    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    xplane = max(xplanes, key=os.path.getmtime)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_step import report
    report(xplane, 10, 48)
    print(f"\nideal bwd ms per 10-iter group at 197 TF/s = "
          f"{[round(f * 10 / 197e12 * 1e3, 2) for *_, f in fns]}")


if __name__ == "__main__":
    main()
