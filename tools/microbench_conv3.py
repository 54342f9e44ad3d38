"""Round 2: does breaking the BN-apply->conv prologue fusion recover MFU?

The fwd+bwd profile shows stage1 convs with a BN-normalize prologue at 33%
MFU (5.35 ms) while the same-shape dgrad convs run 2.1 ms. Hypothesis: the
elementwise prologue fused into the conv destroys Mosaic's conv pipelining;
materializing the normalized tensor (optimization_barrier) should trade
~0.5 ms of HBM traffic for ~3 ms of conv time.

Times via the hardware profiler (per-op), not wall clock — wall timing is
unreliable through the axon tunnel.
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
    from jax import lax

    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    dn = ("NHWC", "HWIO", "NHWC")
    rng = np.random.default_rng(0)
    B, H, W, C = 128, 8, 512, 192
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    shift = jnp.asarray(rng.standard_normal((C,)), jnp.float32)

    def bn_apply(x):
        return (x.astype(jnp.float32) * scale + shift).astype(jnp.bfloat16)

    def stats(y):
        f = y.astype(jnp.float32)
        return jnp.sum(f, (0, 1, 2)), jnp.sum(f * f, (0, 1, 2))

    @jax.jit
    def fused(x, k):
        y = lax.conv_general_dilated(jax.nn.relu(bn_apply(x)), k, (1, 1),
                                     "SAME", dimension_numbers=dn)
        s, ss = stats(y)
        return y, s, ss

    @jax.jit
    def barriered(x, k):
        xb = jax.nn.relu(bn_apply(x))
        (xb,) = lax.optimization_barrier((xb,))
        y = lax.conv_general_dilated(xb, k, (1, 1), "SAME",
                                     dimension_numbers=dn)
        s, ss = stats(y)
        return y, s, ss

    @jax.jit
    def plain(x, k):
        y = lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                     dimension_numbers=dn)
        s, ss = stats(y)
        return y, s, ss

    # also: barrier between conv and the stats epilogue
    @jax.jit
    def barriered_both(x, k):
        xb = jax.nn.relu(bn_apply(x))
        (xb,) = lax.optimization_barrier((xb,))
        y = lax.conv_general_dilated(xb, k, (1, 1), "SAME",
                                     dimension_numbers=dn)
        (y2,) = lax.optimization_barrier((y,))
        s, ss = stats(y2)
        return y, s, ss

    fns = [("fused bn+relu->conv->stats", fused),
           ("barrier(bn+relu) -> conv->stats", barriered),
           ("barrier both sides", barriered_both),
           ("plain conv->stats", plain)]

    # compile + warm
    for _, f in fns:
        r = f(x, k)
        _ = float(jnp.sum(r[1]))

    trace_dir = "/tmp/htrvt_trace_bnconv"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _, f in fns:
            for _ in range(10):
                r = f(x, k)
            _ = float(jnp.sum(r[1]))

    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    xplane = max(xplanes, key=os.path.getmtime)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_step import report
    report(xplane, 10, 25)


if __name__ == "__main__":
    main()
