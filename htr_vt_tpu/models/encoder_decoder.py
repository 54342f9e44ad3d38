"""Autoregressive encoder-decoder recognizer.

The reference ships run scripts, tokenizer, loss/eval utilities and CLI flags
for an ``HTR_EncoderDecoder`` (data/utils/encoder_decoder_{tokenizer,utils}.py,
run/train_encoder_decoder_iam.sh, model_v1/utils/option.py:70-101) but the
model and trainer themselves are missing from the repo (SURVEY §2.6 last
row). This module completes the family TPU-natively:

- encoder: the shared HTRVT trunk (stem + encoder blocks + norm) producing
  [B, N, D] visual memory;
- decoder: ``decoder_layers`` pre-norm blocks of causal self-attention,
  cross-attention over the memory, and MLP, with learned char embeddings and
  sin-cos positions;
- training: teacher-forced cross-entropy with label smoothing and pad
  masking (matching compute_encoder_decoder_loss semantics,
  data/utils/encoder_decoder_utils.py:7-63);
- generation: greedy / nucleus sampling / beam search as a ``lax.scan`` over
  positions with a static max length (no dynamic shapes under jit), with
  repetition penalty (reference flags --generation-* / --repetition-penalty).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from htr_vt_tpu.config import ModelConfig
from htr_vt_tpu.models.htr_vt import HTRVT
from htr_vt_tpu.models.layers import Mlp, sincos_pos_embed_1d
from htr_vt_tpu.models.vit import multi_head_attention, _split_heads

_XAVIER = nn.initializers.xavier_uniform()


class DecoderBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    model_dim: int = 0  # set by the parent (setup-style submodules need it)

    def setup(self):
        c = self.model_dim
        self.norm1 = nn.LayerNorm(dtype=jnp.float32, name="norm1")
        self.self_qkv = nn.Dense(3 * c, dtype=self.dtype, kernel_init=_XAVIER,
                                 name="self_qkv")
        self.self_proj = nn.Dense(c, dtype=self.dtype, kernel_init=_XAVIER,
                                  name="self_proj")
        self.norm2 = nn.LayerNorm(dtype=jnp.float32, name="norm2")
        self.cross_q = nn.Dense(c, dtype=self.dtype, kernel_init=_XAVIER,
                                name="cross_q")
        self.norm_mem = nn.LayerNorm(dtype=jnp.float32, name="norm_mem")
        self.cross_kv = nn.Dense(2 * c, dtype=self.dtype, kernel_init=_XAVIER,
                                 name="cross_kv")
        self.cross_proj = nn.Dense(c, dtype=self.dtype, kernel_init=_XAVIER,
                                   name="cross_proj")
        self.norm3 = nn.LayerNorm(dtype=jnp.float32, name="norm3")
        self.mlp = Mlp(int(c * self.mlp_ratio), drop_rate=self.drop,
                       dtype=self.dtype, name="mlp")

    def _heads(self, t):
        return _split_heads(t, self.num_heads)

    def __call__(self, x, memory, *, deterministic: bool = True):
        b, t, c = x.shape
        head_dim = c // self.num_heads

        # Causal self-attention.
        y = self.norm1(x).astype(self.dtype)
        q, k, v = jnp.split(self.self_qkv(y), 3, axis=-1)
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        y = multi_head_attention(self._heads(q), self._heads(k), self._heads(v),
                                 scale=head_dim**-0.5, mask=causal,
                                 out_dtype=self.dtype)
        x = x + self.self_proj(y)

        # Cross-attention over visual memory.
        y = self.norm2(x).astype(self.dtype)
        q = self.cross_q(y)
        k, v = jnp.split(self.cross_kv(self.norm_mem(memory).astype(self.dtype)),
                         2, axis=-1)
        y = multi_head_attention(self._heads(q), self._heads(k), self._heads(v),
                                 scale=head_dim**-0.5, out_dtype=self.dtype)
        x = x + self.cross_proj(y)

        y = self.norm3(x).astype(self.dtype)
        x = x + self.mlp(y, deterministic=deterministic)
        return x

    # -- KV-cached single-token decode ------------------------------------
    def prefill_cross_kv(self, memory):
        """Per-layer cross-attention K,V computed once per sequence."""
        k, v = jnp.split(self.cross_kv(self.norm_mem(memory).astype(self.dtype)),
                         2, axis=-1)
        return self._heads(k), self._heads(v)

    def decode_step(self, x_t, pos, self_k, self_v, mem_k, mem_v):
        """x_t: [B, 1, C]; self_k/v: [B, H, L, hd] caches; pos: scalar index.
        Returns (y_t [B,1,C], new self_k, new self_v)."""
        b, _, c = x_t.shape
        head_dim = c // self.num_heads
        max_len = self_k.shape[2]

        y = self.norm1(x_t).astype(self.dtype)
        q, k, v = jnp.split(self.self_qkv(y), 3, axis=-1)
        self_k = jax.lax.dynamic_update_slice(
            self_k, self._heads(k).astype(self_k.dtype), (0, 0, pos, 0))
        self_v = jax.lax.dynamic_update_slice(
            self_v, self._heads(v).astype(self_v.dtype), (0, 0, pos, 0))
        valid = (jnp.arange(max_len) <= pos)[None, None, None, :]
        y = multi_head_attention(self._heads(q), self_k, self_v,
                                 scale=head_dim**-0.5, mask=valid,
                                 out_dtype=self.dtype)
        x_t = x_t + self.self_proj(y)

        y = self.norm2(x_t).astype(self.dtype)
        q = self.cross_q(y)
        y = multi_head_attention(self._heads(q), mem_k, mem_v,
                                 scale=head_dim**-0.5, out_dtype=self.dtype)
        x_t = x_t + self.cross_proj(y)

        y = self.norm3(x_t).astype(self.dtype)
        x_t = x_t + self.mlp(y, deterministic=True)
        return x_t, self_k, self_v


class HTREncoderDecoder(nn.Module):
    """Shared HTRVT encoder + transformer decoder. vocab_size must count the
    ED tokenizer's specials (pad/sos/eos/unk)."""

    cfg: ModelConfig
    vocab_size: int
    decoder_layers: int = 6
    decoder_heads: int = 8
    max_seq_len: int = 256

    def setup(self):
        self.encoder = HTRVT(self.cfg)
        dtype = jnp.dtype(self.cfg.compute_dtype)
        self.embed = nn.Embed(self.vocab_size, self.cfg.embed_dim,
                              embedding_init=nn.initializers.normal(0.02))
        self.blocks = [DecoderBlock(self.decoder_heads, dtype=dtype,
                                    model_dim=self.cfg.embed_dim, name=f"dec{i}")
                       for i in range(self.decoder_layers)]
        self.final_norm = nn.LayerNorm(dtype=jnp.float32)
        self.lm_head = nn.Dense(self.vocab_size, dtype=jnp.float32,
                                kernel_init=_XAVIER)

    def encode(self, image, *, train: bool = False, use_masking: bool = False,
               mask_mode: Optional[str] = None, mask_ratio: Optional[float] = None):
        _, feats = self.encoder(image, train=train, use_masking=use_masking,
                                mask_mode=mask_mode, mask_ratio=mask_ratio,
                                return_features=True)
        return feats

    def decode_logits(self, memory, tgt_input, *, train: bool = False):
        """Teacher-forcing decode: [B, L] token ids -> [B, L, V] logits."""
        dtype = jnp.dtype(self.cfg.compute_dtype)
        t = tgt_input.shape[1]
        x = self.embed(tgt_input).astype(dtype)
        pos = sincos_pos_embed_1d(self.cfg.embed_dim, self.max_seq_len)
        x = x + jnp.asarray(pos[:t], dtype)[None]
        for block in self.blocks:
            x = block(x, memory, deterministic=not train)
        return self.lm_head(self.final_norm(x))

    def __call__(self, image, tgt_input, *, train: bool = False,
                 use_masking: bool = False, mask_mode: Optional[str] = None,
                 mask_ratio: Optional[float] = None):
        memory = self.encode(image, train=train, use_masking=use_masking,
                             mask_mode=mask_mode, mask_ratio=mask_ratio)
        return self.decode_logits(memory, tgt_input, train=train)

    # -- KV-cached generation support --------------------------------------
    def prefill(self, memory):
        """Cross-attention K,V for every decoder layer: list of (k, v)."""
        return [blk.prefill_cross_kv(memory) for blk in self.blocks]

    def decode_one(self, token, pos, mem_kvs, self_ks, self_vs):
        """One cached decode step. token: [B] ids; pos: scalar position;
        self_ks/self_vs: [layers, B, H, L, hd] stacked caches.
        Returns (logits [B, V], new self_ks, new self_vs)."""
        dtype = jnp.dtype(self.cfg.compute_dtype)
        x = self.embed(token[:, None]).astype(dtype)  # [B,1,C]
        pos_table = jnp.asarray(
            sincos_pos_embed_1d(self.cfg.embed_dim, self.max_seq_len), dtype)
        x = x + jax.lax.dynamic_slice_in_dim(pos_table, pos, 1, axis=0)[None]
        new_ks, new_vs = [], []
        for i, blk in enumerate(self.blocks):
            mk, mv = mem_kvs[i]
            x, k, v = blk.decode_step(x, pos, self_ks[i], self_vs[i], mk, mv)
            new_ks.append(k)
            new_vs.append(v)
        logits = self.lm_head(self.final_norm(x))[:, 0]
        return logits, jnp.stack(new_ks), jnp.stack(new_vs)


def teacher_forcing_loss(logits: jax.Array, tgt_output: jax.Array,
                         pad_id: int = 0, label_smoothing: float = 0.1) -> jax.Array:
    """Mean label-smoothed CE over non-pad positions
    (compute_encoder_decoder_loss, data/utils/encoder_decoder_utils.py:7-63)."""
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(tgt_output, v)
    smooth = onehot * (1.0 - label_smoothing) + label_smoothing / v
    ce = -(smooth * logp).sum(-1)
    mask = (tgt_output != pad_id).astype(jnp.float32)
    return (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)


# ---------------------------------------------------------------------------
# Generation (reference flags: --generation-method greedy|nucleus|beam_search,
# --generation-temperature, --top-p, --repetition-penalty, --beam-size).
# ---------------------------------------------------------------------------
def generate(model: HTREncoderDecoder, variables, image, *, method: str = "greedy",
             max_len: int = 128, sos_id: int = 1, eos_id: int = 2,
             temperature: float = 0.7, top_p: float = 0.9,
             repetition_penalty: float = 1.3, rng: Optional[jax.Array] = None,
             beam_size: int = 5) -> jax.Array:
    """Autoregressive generation with static shapes. Returns [B, max_len] ids
    (everything after the first <eos> is garbage; the tokenizer stops there).

    All methods (greedy / nucleus / beam) are KV-cached: cross-attention K,V
    are prefilled once from the memory and self-attention caches grow in
    place, so each step is O(1) decoder work under one lax.scan.
    """
    if method == "beam_search":
        return _beam_generate(model, variables, image, max_len=max_len,
                              sos_id=sos_id, eos_id=eos_id, beam_size=beam_size)

    memory = model.apply(variables, image, method=model.encode)
    b = image.shape[0]
    tokens = jnp.full((b, max_len + 1), 0, jnp.int32).at[:, 0].set(sos_id)
    finished = jnp.zeros((b,), bool)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    # KV caches: cross-attention K,V prefilled once; self-attention caches
    # grow in place — each step is O(1) decoder work instead of re-decoding
    # the whole prefix.
    mem_kvs = model.apply(variables, memory, method=model.prefill)
    layers = model.decoder_layers
    heads = model.decoder_heads
    hd = model.cfg.embed_dim // heads
    dtype = jnp.dtype(model.cfg.compute_dtype)
    self_ks = jnp.zeros((layers, b, heads, max_len, hd), dtype)
    self_vs = jnp.zeros((layers, b, heads, max_len, hd), dtype)

    def step(carry, t):
        tokens, finished, rng, ks, vs = carry
        tok_t = jax.lax.dynamic_slice_in_dim(tokens, t, 1, axis=1)[:, 0]
        logit_t, ks, vs = model.apply(variables, tok_t, t, mem_kvs, ks, vs,
                                      method=model.decode_one)  # [B, V]
        # repetition penalty: divide logits of already-emitted tokens
        counts = jax.nn.one_hot(tokens, logit_t.shape[-1]).sum(axis=1)  # [B, V]
        seen = counts > 0
        penalized = jnp.where(logit_t > 0, logit_t / repetition_penalty,
                              logit_t * repetition_penalty)
        logit_t = jnp.where(seen, penalized, logit_t)

        if method == "greedy":
            nxt = jnp.argmax(logit_t, axis=-1)
        elif method == "nucleus":
            rng, key = jax.random.split(rng)
            scaled = logit_t / jnp.maximum(temperature, 1e-6)
            sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            cutoff_idx = jnp.sum(cum < top_p, axis=-1)
            cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=1)
            filtered = jnp.where(scaled < cutoff, -1e9, scaled)
            nxt = jax.random.categorical(key, filtered, axis=-1)
        else:
            raise ValueError(f"unknown generation method {method!r}")

        nxt = jnp.where(finished, 0, nxt.astype(jnp.int32))
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t + 1))
        finished = finished | (nxt == eos_id)
        return (tokens, finished, rng, ks, vs), None

    (tokens, _, _, _, _), _ = jax.lax.scan(
        step, (tokens, finished, rng, self_ks, self_vs), jnp.arange(max_len))
    return tokens[:, 1:]


def _beam_generate(model, variables, image, *, max_len: int, sos_id: int,
                   eos_id: int, beam_size: int) -> jax.Array:
    """Beam search vectorized as a [B*K] batch with KV-cached decode steps.

    Each step runs one cached decoder step per beam (O(1) decoder work) and
    reorders the self-attention caches with the surviving beams, instead of
    re-decoding the whole prefix (the O(L^2) shape this replaced)."""
    memory = model.apply(variables, image, method=model.encode)
    b, n, d = memory.shape
    k = beam_size
    mem = jnp.repeat(memory, k, axis=0)  # [B*K, N, D]
    tokens = jnp.full((b * k, max_len + 1), 0, jnp.int32).at[:, 0].set(sos_id)
    scores = jnp.tile(jnp.array([0.0] + [-1e9] * (k - 1)), (b,))  # only beam 0 live
    finished = jnp.zeros((b * k,), bool)

    mem_kvs = model.apply(variables, mem, method=model.prefill)
    layers = model.decoder_layers
    heads = model.decoder_heads
    hd = model.cfg.embed_dim // heads
    dtype = jnp.dtype(model.cfg.compute_dtype)
    self_ks = jnp.zeros((layers, b * k, heads, max_len, hd), dtype)
    self_vs = jnp.zeros((layers, b * k, heads, max_len, hd), dtype)

    def step(carry, t):
        tokens, scores, finished, ks, vs = carry
        tok_t = jax.lax.dynamic_slice_in_dim(tokens, t, 1, axis=1)[:, 0]
        logit_t, ks, vs = model.apply(variables, tok_t, t, mem_kvs, ks, vs,
                                      method=model.decode_one)  # [B*K, V]
        v = logit_t.shape[-1]
        logp = jax.nn.log_softmax(logit_t.astype(jnp.float32), axis=-1)
        # finished beams only extend with pad at no cost
        pad_only = jnp.full((v,), -1e9).at[0].set(0.0)
        logp = jnp.where(finished[:, None], pad_only[None], logp)
        cand = scores[:, None] + logp  # [B*K, V]
        cand = cand.reshape(b, k * v)
        top_scores, top_idx = jax.lax.top_k(cand, k)  # [B, K]
        beam_idx = top_idx // v + jnp.arange(b)[:, None] * k  # flat source beam
        tok_idx = (top_idx % v).astype(jnp.int32)
        flat = beam_idx.reshape(-1)
        tokens = tokens[flat]
        tokens = tokens.at[:, t + 1].set(tok_idx.reshape(-1))
        finished = finished[flat] | (tok_idx.reshape(-1) == eos_id)
        # carry each surviving beam's cache with it
        ks = ks[:, flat]
        vs = vs[:, flat]
        return (tokens, top_scores.reshape(-1), finished, ks, vs), None

    (tokens, scores, _, _, _), _ = jax.lax.scan(
        step, (tokens, scores, finished, self_ks, self_vs), jnp.arange(max_len))
    best = jnp.argmax(scores.reshape(b, k), axis=1) + jnp.arange(b) * k
    return tokens[best, 1:]
