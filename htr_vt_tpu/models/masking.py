"""Token-masking strategies, fully vectorized for XLA.

The reference builds masks with Python loops on the host — batch-shared spans
(model_v1/model/HTR_VT.py:202-220) and per-sample random / block / spaced-span
/ MMS-union masks with worst-case O(B*10000) Python iterations
(model_sgm_mms_attach/model/HTR_VT.py:222-346). Here every strategy is a pure
function of a PRNG key built from broadcasted-iota comparisons and bounded
``lax.fori_loop``s, so masking traces into the jitted train step.

All generators return a *keep* mask, float32 ``[B, L, 1]`` with 1 = keep,
0 = replace with the learned mask token, matching the reference convention.

Coverage semantics: the random and span_old strategies are exact
distributional matches. The block and spaced-span strategies replicate the
reference's "place segments until ~ratio*L covered" rule with a bounded
iteration count (the reference bounds at 10000). Block placements converge
within a few dozen iterations at any L (blocks can be as long as the
remaining target); spaced spans are capped at max_span tokens each and
suffer spacing-conflict rejections, so their budget scales with L
(tests/test_masking.py pins convergence to the reference's 10000-cap
coverage for L in {128, 256, 512}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from htr_vt_tpu.config import MaskConfig

_MAX_PLACEMENTS = 48  # bounded replacement for the reference's 10000-iteration cap


def _span_placements(length: int) -> int:
    """Attempt budget for spaced-span placement: 2 attempts per token.
    Measured to reproduce the reference's 10000-cap coverage to <0.01
    absolute for L <= 512 at ratio 0.4 (where spacing k=s makes late
    placements mostly rejections); the flat 48 the other strategies use
    starves coverage beyond L=128 (round-4 verdict #4)."""
    return max(_MAX_PLACEMENTS, 2 * length)


def span_mask(rng: jax.Array, batch: int, length: int, ratio: float,
              max_span: int) -> jax.Array:
    """Batch-shared fixed-length spans (model_v1 ``generate_span_mask``).

    num_spans = int(L*ratio) // max_span spans of exactly ``max_span`` tokens,
    starts uniform over [0, L - max_span) — the reference's
    ``torch.randint(L - max_span_length, (1,))`` — identical positions for the
    whole batch; overlaps allowed.
    """
    num_spans = int(length * ratio) // max(1, max_span)
    if num_spans <= 0 or ratio <= 0.0:
        return jnp.ones((batch, length, 1), jnp.float32)
    starts = jax.random.randint(rng, (num_spans,), 0, length - max_span)
    pos = jnp.arange(length)[None, :]
    covered = ((pos >= starts[:, None]) & (pos < starts[:, None] + max_span)).any(axis=0)
    keep = 1.0 - covered.astype(jnp.float32)
    return jnp.broadcast_to(keep[None, :, None], (batch, length, 1))


def span_old_mask(rng: jax.Array, batch: int, length: int, ratio: float,
                  max_span: int) -> jax.Array:
    """MMS-family ``_mask_span_old_1d``: same as span_mask but starts uniform
    over the inclusive range [0, L - s] (reference :320)."""
    s = min(max_span, length)
    num_spans = int(length * ratio) // max(1, max_span)
    if num_spans <= 0 or ratio <= 0.0 or max_span <= 0:
        return jnp.ones((batch, length, 1), jnp.float32)
    starts = jax.random.randint(rng, (num_spans,), 0, length - s + 1)
    pos = jnp.arange(length)[None, :]
    covered = ((pos >= starts[:, None]) & (pos < starts[:, None] + s)).any(axis=0)
    keep = 1.0 - covered.astype(jnp.float32)
    return jnp.broadcast_to(keep[None, :, None], (batch, length, 1))


def random_mask(rng: jax.Array, batch: int, length: int, ratio: float) -> jax.Array:
    """Per-sample exact-count random token mask (``_mask_random_1d``):
    exactly round(ratio*L) tokens masked per sample via noise argsort."""
    num = int(round(ratio * length))
    if num <= 0:
        return jnp.ones((batch, length, 1), jnp.float32)
    noise = jax.random.uniform(rng, (batch, length))
    kth = jnp.sort(noise, axis=1)[:, num - 1][:, None]
    masked = noise <= kth
    return (1.0 - masked.astype(jnp.float32))[:, :, None]


def block_mask(rng: jax.Array, batch: int, length: int, ratio: float,
               min_block: int = 2) -> jax.Array:
    """Per-sample contiguous-segment masking (``_mask_block_1d``): repeatedly
    place blocks of random length in [min_block, remaining-target] at uniform
    starts until coverage reaches round(ratio*L)."""
    target = int(round(ratio * length))
    if target <= 0:
        return jnp.ones((batch, length, 1), jnp.float32)
    pos = jnp.arange(length)[None, :]

    def body(i, carry):
        masked = carry  # bool [B, L]
        covered = masked.sum(axis=1)  # [B]
        k_len, k_start = jax.random.split(jax.random.fold_in(rng, i))
        remain = jnp.maximum(1, target - covered)
        hi = jnp.clip(remain, min_block, length)  # block length upper bound
        u = jax.random.uniform(k_len, (batch,))
        blk = min_block + jnp.floor(u * (hi - min_block + 1)).astype(jnp.int32)
        u2 = jax.random.uniform(k_start, (batch,))
        start = jnp.floor(u2 * (length - blk + 1)).astype(jnp.int32)
        seg = (pos >= start[:, None]) & (pos < (start + blk)[:, None])
        active = (covered < target)[:, None]
        return masked | (seg & active)

    masked = jax.lax.fori_loop(
        0, _MAX_PLACEMENTS, body, jnp.zeros((batch, length), bool))
    return (1.0 - masked.astype(jnp.float32))[:, :, None]


def span_spacing_mask(rng: jax.Array, batch: int, length: int, ratio: float,
                      max_span: int) -> jax.Array:
    """Per-sample spaced spans (``_mask_span_1d``): place spans of random
    length s in [1, max_span] at uniform starts, accepted only when a spacing
    neighborhood of k tokens on each side is still unmasked, until coverage
    reaches round(ratio*L). Spacing policy (reference :278-285):
    k = s for ratio <= 0.4, k = 1 for ratio <= 0.7, else 0."""
    target = int(round(ratio * length))
    if target <= 0:
        return jnp.ones((batch, length, 1), jnp.float32)
    max_span = max(1, min(max_span, length))
    if ratio <= 0.4:
        fixed_k = None
    elif ratio <= 0.7:
        fixed_k = 1
    else:
        fixed_k = 0
    pos = jnp.arange(length)[None, :]

    def body(i, carry):
        masked = carry
        covered = masked.sum(axis=1)
        k_len, k_start = jax.random.split(jax.random.fold_in(rng, i))
        s = jax.random.randint(k_len, (batch,), 1, max_span + 1)
        u = jax.random.uniform(k_start, (batch,))
        l = jnp.floor(u * (length - s + 1)).astype(jnp.int32)
        r = l + s - 1
        k = s if fixed_k is None else jnp.full((batch,), fixed_k, jnp.int32)
        # spacing window [l-k, r+k] must contain no previously masked token
        win = (pos >= (l - k)[:, None]) & (pos <= (r + k)[:, None])
        conflict = (masked & win).any(axis=1)
        seg = (pos >= l[:, None]) & (pos <= r[:, None])
        accept = (~conflict) & (covered < target)
        return masked | (seg & accept[:, None])

    # while_loop with a coverage early-exit (advisor r4): the worst-case
    # budget is 2*L attempts (1024 at L=512) but coverage typically
    # saturates within a few dozen — matching the reference's pairing of a
    # 10000-cap with an early exit (:286-291). Identical masks to the
    # bounded fori_loop for the same rng: each attempt folds `i` into the
    # stream, and attempts after full coverage are rejected no-ops.
    budget = _span_placements(length)

    def cond(carry):
        i, masked = carry
        return (i < budget) & jnp.any(masked.sum(axis=1) < target)

    def wbody(carry):
        i, masked = carry
        return i + 1, body(i, masked)

    _, masked = jax.lax.while_loop(
        cond, wbody, (jnp.int32(0), jnp.zeros((batch, length), bool)))
    return (1.0 - masked.astype(jnp.float32))[:, :, None]


def mms_mask(rng: jax.Array, batch: int, length: int, cfg: MaskConfig) -> jax.Array:
    """Union of random + block + spaced-span masks (``generate_mms_mask``)."""
    r1, r2, r3 = jax.random.split(rng, 3)
    keep_r = random_mask(r1, batch, length, cfg.mms_random_ratio)
    keep_b = block_mask(r2, batch, length, cfg.mms_block_ratio)
    keep_s = span_spacing_mask(r3, batch, length, cfg.mms_span_ratio, cfg.max_span_length)
    return keep_r * keep_b * keep_s


def build_keep_mask(rng: jax.Array, batch: int, length: int, cfg: MaskConfig,
                    mode: str | None = None,
                    ratio: float | None = None) -> jax.Array:
    """Dispatch by strategy name. Returns float32 [B, L, 1], 1 = keep.
    ``mode``/``ratio`` override the config (the tri-masked MMS trainer runs
    per-forward (mode, ratio) pairs, reference model_sgm_mms_attach/train.py:76-97)."""
    mode = mode or cfg.mode
    ratio = cfg.ratio if ratio is None else ratio
    if mode == "none" or (ratio <= 0.0 and mode != "mms"):
        return jnp.ones((batch, length, 1), jnp.float32)
    if mode == "span":
        return span_mask(rng, batch, length, ratio, cfg.max_span_length)
    if mode == "span_old":
        return span_old_mask(rng, batch, length, ratio, cfg.max_span_length)
    if mode == "random":
        return random_mask(rng, batch, length, ratio)
    if mode == "block":
        return block_mask(rng, batch, length, ratio)
    if mode == "span_spacing":
        return span_spacing_mask(rng, batch, length, ratio, cfg.max_span_length)
    if mode == "mms":
        return mms_mask(rng, batch, length, cfg)
    raise ValueError(f"unknown mask mode {mode!r}")


def apply_mask(tokens: jax.Array, keep: jax.Array, mask_token: jax.Array) -> jax.Array:
    """x * keep + (1-keep) * mask_token (model_v1/model/HTR_VT.py:212-220)."""
    keep = keep.astype(tokens.dtype)
    return tokens * keep + (1.0 - keep) * mask_token.astype(tokens.dtype)
