"""Pallas TPU kernels for the CTC forward-backward recursions.

Why: the pure-XLA ``lax.scan`` CTC (htr_vt_tpu/ops/ctc.py) costs ~25 ms fwd /
~48 ms bwd at B=128, T=128 on a v5e — 127 sequential loop iterations, each a
tiny [B, 2L+1] elementwise chain that round-trips HBM. Here each recursion is
ONE kernel whose carry lives in VMEM: the grid tiles the batch, and a
``fori_loop`` walks time with pure VPU ops on the [TB, S] alpha/beta rows.

Structure:
  host/XLA side:  logp = log_softmax(logits); lp = gather at extended labels
                  -> [B, T, S]   (one big XLA gather, MXU-free but fast)
  alpha kernel:   alpha[B, T, S] forward recursion          (this file)
  beta kernel:    beta[B, T, S] backward recursion          (this file)
  XLA side:       loss = -logsumexp(final alpha states)
                  dlp = -exp(alpha + beta - total) * g (fused elementwise;
                  beta excludes its own frame's emission)
                  d logits via autodiff of the gather + log_softmax

The extended-label semantics (blank interleaving, no-skip into repeated
labels, zero_infinity) match torch.nn.CTCLoss — see ops/ctc.py for the
reference-semantics notes; unit tests compare all three implementations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))
    return jnp.maximum(out, NEG)


def _shift_lanes(x: jax.Array, k: int) -> jax.Array:
    """Shift right along the last (lane) axis by k, filling with NEG."""
    rolled = pltpu.roll(x, shift=k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < k, NEG, rolled)


def _shift_lanes_left(x: jax.Array, k: int) -> jax.Array:
    rolled = pltpu.roll(x, shift=x.shape[1] - k, axis=1)  # circular left by k
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= x.shape[1] - k, NEG, rolled)


def _alpha_kernel(lp_ref, noskip_ref, valid_ref, start2_ref, alpha_ref,
                  carry_ref):
    """lp [TB,TP,S] (one time panel); noskip/valid/start2 [TB,S]; alpha out
    [TB,TP,S]. The time axis is PANELED over the minor grid dimension (grid
    iteration on TPU is sequential), with the running alpha row carried in
    VMEM scratch across panels — this removes the round-4 VMEM cliff where
    the whole [TB, T, S] cube had to fit at once (round-5 verdict #7)."""
    j = pl.program_id(1)
    tp = lp_ref.shape[1]
    noskip = noskip_ref[:] > 0.5
    invalid = valid_ref[:] < 0.5

    def body(t, alpha):
        lp_t = lp_ref[:, t, :]
        a1 = _shift_lanes(alpha, 1)
        a2 = jnp.where(noskip, NEG, _shift_lanes(alpha, 2))
        new = _logaddexp3(alpha, a1, a2) + lp_t
        new = jnp.where(invalid, NEG, jnp.maximum(new, NEG))
        alpha_ref[:, t, :] = new
        return new

    @pl.when(j == 0)
    def _():
        alpha0 = jnp.where(start2_ref[:] > 0.5, lp_ref[:, 0, :], NEG)
        alpha0 = jnp.where(invalid, NEG, alpha0)
        alpha_ref[:, 0, :] = alpha0
        carry_ref[:] = jax.lax.fori_loop(1, tp, body, alpha0)

    @pl.when(j > 0)
    def _():
        carry_ref[:] = jax.lax.fori_loop(0, tp, body, carry_ref[:])


def _beta_kernel(lp_ref, noskip_ref, valid_ref, end_ref, beta_ref,
                 carry_ref):
    """Backward recursion, paneled over time in REVERSE panel order (the
    index maps feed panel j = the (nt-1-j)-th time slab); beta excludes the
    emission at its own frame. end [TB,S]: 1.0 at the two final states.

    The carry holds ``term = beta[t0] + lp[t0]`` of the panel's first row,
    so the next (earlier) panel never reads this panel's lp block."""
    j = pl.program_id(1)
    tp = lp_ref.shape[1]
    # Skip OUT of s lands in s+2 and is allowed iff noskip[s+2] is false.
    noskip = noskip_ref[:] > 0.5
    invalid = valid_ref[:] < 0.5

    def from_term(term):
        b1 = _shift_lanes_left(term, 1)
        b2 = _shift_lanes_left(jnp.where(noskip, NEG, term), 2)
        return jnp.where(invalid, NEG, _logaddexp3(term, b1, b2))

    def body(i, beta):
        t = tp - 2 - i
        term = beta + lp_ref[:, t + 1, :]  # arrive in state s' at t+1
        new = from_term(term)
        beta_ref[:, t, :] = new
        return new

    @pl.when(j == 0)
    def _():
        beta_last = jnp.where(end_ref[:] > 0.5, 0.0, NEG)
        beta_last = jnp.where(invalid, NEG, beta_last)
        beta_ref[:, tp - 1, :] = beta_last
        beta0 = jax.lax.fori_loop(0, tp - 1, body, beta_last)
        carry_ref[:] = beta0 + lp_ref[:, 0, :]

    @pl.when(j > 0)
    def _():
        top = from_term(carry_ref[:])
        beta_ref[:, tp - 1, :] = top
        beta0 = jax.lax.fori_loop(0, tp - 1, body, top)
        carry_ref[:] = beta0 + lp_ref[:, 0, :]


def _extended(labels: jax.Array, label_lengths: jax.Array, blank: int):
    b, lmax = labels.shape
    s = 2 * lmax + 1
    z = jnp.full((b, s), blank, jnp.int32).at[:, 1::2].set(labels.astype(jnp.int32))
    same2 = jnp.concatenate([jnp.ones((b, 2), bool), z[:, 2:] == z[:, :-2]], axis=1)
    noskip = same2 | (z == blank)
    sidx = jnp.arange(s)[None, :]
    valid = sidx < (2 * label_lengths + 1)[:, None]
    start2 = (sidx == 0) | ((sidx == 1) & (label_lengths[:, None] > 0))
    end = 2 * label_lengths[:, None]
    endm = (sidx == end) | ((sidx == end - 1) & (label_lengths[:, None] > 0))
    return z, noskip, valid, start2, endm


#: scoped-VMEM budget for one grid step's working set (16 MB stack, minus
#: headroom for the masks rows and compiler temporaries)
_VMEM_BUDGET = 12 * 1024 * 1024


def pallas_supported(t: int, s: int) -> bool:
    """The time axis is paneled (``_panel_len``), so T is unbounded; the
    only VMEM constraint left is that ONE time row per batch tile fits:
    tile_b x 1 x S (x2 lp/out x2 double-buffering). S = 2L+1 <= ~90k —
    every conceivable HTR label length qualifies."""
    return 8 * s * 4 * 4 <= _VMEM_BUDGET


def _panel_len(t: int, s: int, tile_b: int) -> int:
    """Largest divisor of t whose per-panel working set (lp + out panels,
    x2 pipelining double-buffering) fits the scoped-VMEM budget."""
    tp = t
    while tp > 1 and tile_b * tp * s * 4 * 4 > _VMEM_BUDGET:
        # t is a token count (W/4) — even at every HTR shape; halving
        # terminates at 1 regardless.
        tp = tp // 2 if tp % 2 == 0 else 1
    return max(1, tp)


def _run_recursion(kernel, lp, masks, tile_b: int, reverse_time: bool):
    b, t, s = lp.shape
    tp = _panel_len(t, s, tile_b)
    nt = t // tp
    if reverse_time:
        idx = lambda i, j: (i, nt - 1 - j, 0)
    else:
        idx = lambda i, j: (i, j, 0)
    grid = (b // tile_b, nt)
    row_spec = pl.BlockSpec((tile_b, s), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    cube_spec = pl.BlockSpec((tile_b, tp, s), idx, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[cube_spec, row_spec, row_spec, row_spec],
        out_specs=cube_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_b, s), jnp.float32)],
    )(lp, *masks)


def _pick_tile(b: int) -> int:
    for tb in (8, 4, 2, 1):
        if b % tb == 0:
            return tb
    return 1


@functools.lru_cache(maxsize=None)
def _partitioned_recursion(kernel):
    """Wrap a recursion kernel in jax.experimental.custom_partitioning so
    GSPMD/Shardy shards it over the batch axis *derived from the operands'
    sharding* — no mesh side channel. Each sample's recursion is independent,
    so the per-shard lowering is just the local pallas_call; the time and
    state axes are declared need-replication.

    This is the SPMD partitioning rule the round-1 ``set_ctc_mesh`` global
    stood in for (multi-chip eval in cli/test*.py now takes the fast kernel
    automatically)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    def impl(lp, m1, m2, m3):
        return _run_recursion(kernel, lp, (m1, m2, m3),
                              _pick_tile(lp.shape[0]),
                              reverse_time=kernel is _beta_kernel)

    fn = custom_partitioning(impl)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_batch_axis(arg_shapes), None, None))

    def partition(mesh, arg_shapes, result_shape):
        batch = _batch_axis(arg_shapes)
        args = (NamedSharding(mesh, P(batch, None, None)),) + \
            (NamedSharding(mesh, P(batch, None)),) * 3
        out = NamedSharding(mesh, P(batch, None, None))
        return mesh, impl, out, args

    fn.def_partition(partition=partition, infer_sharding_from_operands=infer,
                     sharding_rule="b t s, b s, b s, b s -> b t s",
                     need_replication_factors=("t", "s"))
    return fn


@jax.custom_vjp
def _ctc_neglogp(lp, valid_f, noskip_f, start2_f, end_f):
    loss, _ = _ctc_fwd_impl(lp, valid_f, noskip_f, start2_f, end_f)
    return loss


def _logsumexp_masked(a_last, end_f):
    masked = jnp.where(end_f > 0.5, a_last, NEG)
    m = jnp.max(masked, axis=1)
    return m + jnp.log(jnp.sum(jnp.exp(masked - m[:, None]), axis=1))


def _ctc_fwd_impl(lp, valid_f, noskip_f, start2_f, end_f):
    alpha = _partitioned_recursion(_alpha_kernel)(lp, noskip_f, valid_f, start2_f)
    total = _logsumexp_masked(alpha[:, -1, :], end_f)
    return -total, (alpha, total)


def _ctc_fwd(lp, valid_f, noskip_f, start2_f, end_f):
    loss, (alpha, total) = _ctc_fwd_impl(lp, valid_f, noskip_f, start2_f, end_f)
    return loss, (lp, valid_f, noskip_f, end_f, alpha, total)


def _ctc_bwd(residuals, g):
    lp, valid_f, noskip_f, end_f, alpha, total = residuals
    beta = _partitioned_recursion(_beta_kernel)(lp, noskip_f, valid_f, end_f)
    # beta excludes the emission at its own frame, so the state posterior is
    # gamma_t[s] = alpha_t[s] + beta_t[s] - total and d(-total)/d lp[t,s]
    # = -exp(gamma); one fused elementwise op over [B, T, S].
    log_gamma = alpha + beta - total[:, None, None]
    dlp = -jnp.exp(jnp.minimum(log_gamma, 0.0)) * g[:, None, None]
    dlp = jnp.where(log_gamma > -80.0, dlp, 0.0)
    zeros = jnp.zeros_like
    return dlp, zeros(valid_f), zeros(noskip_f), zeros(lp[:, 0, :]), zeros(end_f)


_ctc_neglogp.defvjp(_ctc_fwd, _ctc_bwd)


def ctc_loss_pallas(logits: jax.Array, labels: jax.Array,
                    label_lengths: jax.Array, blank: int = 0,
                    zero_infinity: bool = True) -> jax.Array:
    """Drop-in for ops.ctc.ctc_loss on TPU (full frame count only; the
    HTR pipeline always emits T frames per sample)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.int32)
    label_lengths = label_lengths.astype(jnp.int32)
    b, t, c = logits.shape
    z, noskip, valid, start2, endm = _extended(labels, label_lengths, blank)

    logp = jax.nn.log_softmax(logits, axis=-1)
    # Gather at extended labels expressed as a one-hot matmul: XLA's native
    # gather costs ~33 ms here on a v5e, the MXU matmul ~2 ms — and with
    # HIGHEST precision it is bit-exact (one-hot rows select single values).
    onehot = jax.nn.one_hot(z, c, dtype=jnp.float32)  # [B, S, C]
    lp = jnp.einsum("btc,bsc->bts", logp, onehot,
                    precision=jax.lax.Precision.HIGHEST)
    f32 = lambda m: m.astype(jnp.float32)
    loss = _ctc_neglogp(lp, f32(valid), f32(noskip), f32(start2), f32(endm))

    if zero_infinity:
        feasible = loss < 1e29
        loss = jnp.where(feasible, loss, 0.0)
        loss = loss * jax.lax.stop_gradient(feasible.astype(jnp.float32)) + \
            jax.lax.stop_gradient(jnp.where(feasible, 0.0, loss))
    return loss
