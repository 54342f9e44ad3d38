"""Hardware A/B: XLA fused attention vs the Pallas flash-attention kernel.

Measures the exact attention shapes the width buckets produce —
N = 128 (512 px, the flagship), 256 (1024 px), 512 (2048 px) — at the
serving batch size, forward-only (serving) and forward+backward (training),
and checks numerics against the f32-softmax XLA path. This is the evidence
behind ModelConfig.attn_impl's "auto" threshold (models/vit.py:
resolve_attn_impl): at N=128 the [B,H,N,N] matrix is small and XLA's fused
emitter wins; at N=512 that matrix is 805 MB/layer/pass in f32 and the
streaming-softmax kernel should dominate.

Usage: python tools/bench_attn.py [--bs 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from htr_vt_tpu.models.vit import flash_mha, multi_head_attention

    H, D = 6, 128
    scale = D ** -0.5
    rng = np.random.default_rng(0)
    rows = []

    def timeit(fn, *a):
        r = fn(*a)
        jax.block_until_ready(r)
        # axon gotcha: sync via a host readback downstream of the result.
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn(*a)
        _ = float(jnp.sum(r) if not isinstance(r, tuple) else sum(
            jnp.sum(x) for x in r))
        return (time.perf_counter() - t0) / args.iters * 1e3

    for N in (128, 256, 512):
        q, k, v = (jnp.asarray(rng.standard_normal((args.bs, H, N, D)),
                               jnp.bfloat16) for _ in range(3))

        xla_f = jax.jit(lambda q, k, v: multi_head_attention(q, k, v, scale))
        fla_f = jax.jit(lambda q, k, v: flash_mha(q, k, v, scale))

        # numerics (bf16 inputs, f32 softmax both sides)
        ref = np.asarray(xla_f(q, k, v), np.float32)
        got = np.asarray(fla_f(q, k, v), np.float32)
        err = float(np.abs(ref - got).max())

        loss_x = jax.jit(jax.grad(
            lambda q: jnp.sum(multi_head_attention(q, k, v, scale)
                              .astype(jnp.float32) ** 2)))
        loss_f = jax.jit(jax.grad(
            lambda q: jnp.sum(flash_mha(q, k, v, scale)
                              .astype(jnp.float32) ** 2)))
        gerr = float(np.abs(np.asarray(loss_x(q), np.float32)
                            - np.asarray(loss_f(q), np.float32)).max())

        row = {"N": N,
               "fwd_xla_ms": round(timeit(xla_f, q, k, v), 3),
               "fwd_flash_ms": round(timeit(fla_f, q, k, v), 3),
               "grad_xla_ms": round(timeit(loss_x, q), 3),
               "grad_flash_ms": round(timeit(loss_f, q), 3),
               "max_abs_err_fwd": err, "max_abs_err_grad": gerr}
        rows.append(row)
        print(row, flush=True)

    import json
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
