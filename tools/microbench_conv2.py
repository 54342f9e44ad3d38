"""Round 2: why are forward stem convs 2-3x off roofline while dgrad is fast?

All variants consume the conv into a scalar so jit-boundary layouts can't
distort timing; 'keep' variants also return the big array.
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

    PEAK = 197e12

    def timeit(fn, *args, iters=20):
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        leaf = jax.tree.leaves(r)[0]
        _ = float(jnp.sum(leaf).astype(jnp.float32))
        return (time.perf_counter() - t0) / iters

    dn = ("NHWC", "HWIO", "NHWC")
    rng = np.random.default_rng(0)

    B, H, W, C = 128, 8, 512, 192
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
    flops = 2 * B * H * W * C * 9 * C

    def report(name, t):
        print(f"{name:44s} {t*1e3:8.3f} ms  {flops/t/PEAK*100:5.1f}% MFU")

    @jax.jit
    def conv_scalar(x, k):
        y = lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn)
        return jnp.sum(y.astype(jnp.float32))

    report("fwd conv -> scalar", timeit(conv_scalar, x, k))

    @jax.jit
    def conv_keep(x, k):
        y = lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn)
        return y, jnp.sum(y.astype(jnp.float32))

    report("fwd conv -> keep y + scalar", timeit(conv_keep, x, k))

    # dgrad-shaped conv: same spatial shape, flipped kernel — what the vjp runs
    @jax.jit
    def dgrad_like(x, k):
        y = lax.conv_general_dilated(x, jnp.flip(k, (0, 1)).transpose(0, 1, 3, 2),
                                     (1, 1), "SAME", dimension_numbers=dn)
        return jnp.sum(y.astype(jnp.float32))

    report("dgrad-shaped conv -> scalar", timeit(dgrad_like, x, k))

    # W-major spatial layout: [B, W, H, C]
    xT = jnp.asarray(np.transpose(np.asarray(x, np.float32), (0, 2, 1, 3)),
                     jnp.bfloat16)

    @jax.jit
    def conv_T(xT, k):
        y = lax.conv_general_dilated(xT, k, (1, 1), "SAME", dimension_numbers=dn)
        return jnp.sum(y.astype(jnp.float32))

    report("fwd conv, W-major [B,512,8,C] -> scalar", timeit(conv_T, xT, k))

    # flatten H into batch via 1x3 convs + shifted adds (3 row convs)
    k_rows = [k[i] for i in range(3)]  # each [3, C, C]

    @jax.jit
    def conv_rows(x, k):
        # y[h] = sum_dh conv1d(x[h+dh-1], k[dh]) — express as 3 full-tensor
        # 1x3 convs then shift-add along H.
        outs = []
        for dh in range(3):
            kk = k[dh:dh + 1]  # [1,3,C,C]
            y = lax.conv_general_dilated(x, kk, (1, 1), ((0, 0), (1, 1)),
                                         dimension_numbers=dn)
            outs.append(y)
        yc = outs[1]
        up = jnp.pad(outs[0][:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
        down = jnp.pad(outs[2][:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
        return jnp.sum((yc + up + down).astype(jnp.float32))

    report("3x(1x3 conv) + shift-add -> scalar", timeit(conv_rows, x, k))

    # reshape to [B*H, 1, W, C]-ish: merge B,H then 1x3 conv (only the dw=inner
    # 1D part; measures pure 1-D conv speed at M=B*H*W)
    x2 = x.reshape(B * H, W, C)
    k1 = k[1]  # [3, C, C]

    @jax.jit
    def conv1d(x2, k1):
        y = lax.conv_general_dilated(x2, k1, (1,), ((1, 1),),
                                     dimension_numbers=("NWC", "WIO", "NWC"))
        return jnp.sum(y.astype(jnp.float32))

    t = timeit(conv1d, x2, k1)
    f1 = 2 * B * H * W * C * 3 * C
    print(f"{'1-D 1x3 conv [B*H,W,C] -> scalar':44s} {t*1e3:8.3f} ms  "
          f"{f1/t/PEAK*100:5.1f}% MFU")

    # dot_general equivalent compute: [B*H*W, 9C] x [9C, C] with materialized
    # patches (im2col cost included)
    @jax.jit
    def im2col_dot(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, i:i + H, j:j + W] for i in range(3) for j in range(3)]
        patches = jnp.concatenate(cols, axis=-1).reshape(B * H * W, 9 * C)
        y = patches @ k.reshape(9 * C, C)
        return jnp.sum(y.astype(jnp.float32))

    report("im2col + dot -> scalar", timeit(im2col_dot, x, k))

    # pure matmul same FLOPs: [B*H*W, 9C] x [9C, C]
    a = jnp.asarray(rng.standard_normal((B * H * W, 9 * C)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((9 * C, C)), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return jnp.sum((a @ b).astype(jnp.float32))

    report("pure matmul same FLOPs", timeit(mm, a, b))


if __name__ == "__main__":
    main()
