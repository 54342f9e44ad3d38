"""Max pooling with a hand-written backward (NEGATIVE RESULT — kept for the
record and for non-TPU backends).

XLA differentiates ``reduce_window(max)`` into select-and-scatter, which on
TPU costs ~5 ms per pool per training step at the stem's activation sizes.
This module replaces the backward with 9 strided slice-compare-scatter
passes in window scan order, reproducing select-and-scatter's FIRST-MATCH
tie rule exactly (verified against jax.grad of nn.max_pool in tests).

Measured on a v5e (flagship step, bs 128): 259 ms -> 508 ms. The ``.at[].add``
strided scatters lower far worse than the native select-and-scatter, so the
stem keeps ``nn.max_pool``. A Pallas formulation (VMEM-resident compare +
accumulate) is the remaining avenue if the pool backward ever matters.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG = jnp.finfo(jnp.float32).min


def _pool_fwd_impl(x, window: Tuple[int, int], strides: Tuple[int, int],
                   padding: Tuple[int, int]):
    return jax.lax.reduce_window(
        x, -jnp.inf if x.dtype == jnp.float32 else jnp.finfo(x.dtype).min,
        jax.lax.max,
        (1, window[0], window[1], 1), (1, strides[0], strides[1], 1),
        ((0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool(x, window: Tuple[int, int] = (3, 3),
             strides: Tuple[int, int] = (2, 1),
             padding: Tuple[int, int] = (1, 1)):
    """NHWC max pool with fast exact backward."""
    return _pool_fwd_impl(x, window, strides, padding)


def _fwd(x, window, strides, padding):
    y = _pool_fwd_impl(x, window, strides, padding)
    return y, (x, y)


def _bwd(window, strides, padding, res, g):
    x, y = res
    b, h, w, c = x.shape
    _, ho, wo, _ = y.shape
    kh_n, kw_n = window
    sh, sw = strides
    ph, pw = padding

    fill = jnp.finfo(x.dtype).min
    x_pad = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)),
                    constant_values=fill)
    grad_pad = jnp.zeros_like(x_pad, dtype=g.dtype)
    claimed = jnp.zeros(y.shape, bool)
    yv = y.astype(x.dtype)

    # Window scan order (row-major) == select-and-scatter's first-match order.
    for kh in range(kh_n):
        for kw in range(kw_n):
            sl = (slice(None), slice(kh, kh + sh * ho, sh),
                  slice(kw, kw + sw * wo, sw), slice(None))
            is_max = (x_pad[sl] == yv) & (~claimed)
            claimed = claimed | is_max
            grad_pad = grad_pad.at[sl].add(jnp.where(is_max, g, 0))

    return (grad_pad[:, ph:ph + h, pw:pw + w, :].astype(x.dtype),)


max_pool.defvjp(_fwd, _bwd)
