"""Isolated conv microbenchmarks on TPU: find where the stem's MFU goes.

Times the stem's dominant conv shapes alone, with BN-apply prologue, with
BN-stats epilogue, and as value+grad, comparing against bf16 roofline.
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
    from jax import lax

    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    PEAK = 197e12  # v5e bf16

    def timeit(fn, *args, iters=20):
        r = fn(*args)
        jax.block_until_ready(r)
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        # host readback sync (axon block_until_ready gotcha)
        _ = float(jnp.sum(jax.tree.leaves(r)[0] if isinstance(r, tuple) else r)
                  .astype(jnp.float32))
        return (time.perf_counter() - t0) / iters

    dn = ("NHWC", "HWIO", "NHWC")
    rng = np.random.default_rng(0)

    shapes = [
        # (name, B, H, W, Cin, Cout, strides)
        ("conv1 1->192 @64x512", 128, 64, 512, 1, 192, (2, 1)),
        ("stage1 192 @8x512", 128, 8, 512, 192, 192, (1, 1)),
        ("stage1 dn 192 @16x512 s(2,1)", 128, 16, 512, 192, 192, (2, 1)),
        ("stage2 384 @4x256", 128, 4, 256, 384, 384, (1, 1)),
        ("stage2 dn 192->384 @8x512 s(2,2)", 128, 8, 512, 192, 384, (2, 2)),
        ("stage3 768 @2x128", 128, 2, 128, 768, 768, (1, 1)),
        ("stage3 dn 384->768 @4x256 s(2,2)", 128, 4, 256, 384, 768, (2, 2)),
    ]

    print(f"{'shape':38s} {'fwd ms':>8} {'MFU%':>6} {'+bnstats':>9} {'vjp ms':>8} "
          f"{'vjpMFU%':>8}")
    for name, B, H, W, Ci, Co, st in shapes:
        x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.05, jnp.bfloat16)
        Ho, Wo = H // st[0], W // st[1]
        flops = 2 * B * Ho * Wo * Co * 9 * Ci

        @jax.jit
        def fwd(x, k):
            return lax.conv_general_dilated(x, k, st, "SAME", dimension_numbers=dn)

        @jax.jit
        def fwd_bnstats(x, k):
            y = lax.conv_general_dilated(x, k, st, "SAME", dimension_numbers=dn)
            yf = y.astype(jnp.float32)
            return y, yf.mean((0, 1, 2)), (yf * yf).mean((0, 1, 2))

        @jax.jit
        def vjp(x, k):
            def loss(k):
                y = lax.conv_general_dilated(x, k, st, "SAME", dimension_numbers=dn)
                return (y.astype(jnp.float32) ** 2).mean()
            l, g = jax.value_and_grad(loss)(k)
            return l, g

        t_f = timeit(fwd, x, k)
        t_b = timeit(fwd_bnstats, x, k)
        t_v = timeit(vjp, x, k)
        # vjp = fwd + dgrad + wgrad ~ 3x fwd flops
        print(f"{name:38s} {t_f*1e3:8.3f} {flops/t_f/PEAK*100:6.1f} "
              f"{t_b*1e3:9.3f} {t_v*1e3:8.3f} {3*flops/t_v/PEAK*100:8.1f}")

    # The full stage1 block pattern: bn-apply prologue + conv + stats epilogue,
    # which is what XLA fuses in the real program.
    x = jnp.asarray(rng.standard_normal((128, 8, 512, 192)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 192, 192)) * 0.05, jnp.bfloat16)
    sc = jnp.ones((192,), jnp.float32)
    bi = jnp.zeros((192,), jnp.float32)
    mu = jnp.zeros((192,), jnp.float32)
    var = jnp.ones((192,), jnp.float32)

    @jax.jit
    def full(x, k, sc, bi, mu, var):
        xn = (x.astype(jnp.float32) - mu) * lax.rsqrt(var + 1e-5) * sc + bi
        xn = jax.nn.relu(xn).astype(jnp.bfloat16)
        y = lax.conv_general_dilated(xn, k, (1, 1), "SAME", dimension_numbers=dn)
        yf = y.astype(jnp.float32)
        return y, yf.sum((0, 1, 2)), (yf * yf).sum((0, 1, 2))

    flops = 2 * 128 * 8 * 512 * 192 * 9 * 192
    t = timeit(full, x, k, sc, bi, mu, var)
    print(f"{'bnapply+conv+stats (fusion repro)':38s} {t*1e3:8.3f} "
          f"{flops/t/PEAK*100:6.1f}")

    # f32 kernel converted at use (what the real program does: params f32)
    kf32 = k.astype(jnp.float32)

    @jax.jit
    def fwd_f32k(x, kf32):
        return lax.conv_general_dilated(x, kf32.astype(jnp.bfloat16), (1, 1),
                                        "SAME", dimension_numbers=dn)

    t = timeit(fwd_f32k, x, kf32)
    print(f"{'stage1 conv, f32 param kernel':38s} {t*1e3:8.3f} "
          f"{flops/t/PEAK*100:6.1f}")


if __name__ == "__main__":
    main()
