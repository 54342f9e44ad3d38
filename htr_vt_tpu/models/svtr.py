"""SVTR: three-stage local/global mixing recognizer.

Re-design of model_sgm_mms_svtr/model/svtr.py: a two-conv patch embedding
([B,64,512,1] -> [B,16,128,D0]), three stages of MixingBlocks where the first
half of each stage uses *local* attention (a (7,11) spatial neighborhood mask,
build_local_mask :30-40) and the second half full attention, with 3x3
stride-(2,1) Merging convs between stages (H 16 -> 8 -> 4, width kept), a
height-pooling Combining head (:116-130) and a CTC head with the reference's
anti-blank-collapse bias init (bias[blank] = -3, others +0.1, :290-301).
Presets tiny/small/base/large (:506-535).

The reference rebuilds its local masks lazily per sequence length with a
Python double loop; here they are static numpy constants per stage.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from htr_vt_tpu.config import ModelConfig
from htr_vt_tpu.models import masking
from htr_vt_tpu.models.layers import Mlp
from htr_vt_tpu.models.vit import multi_head_attention, _split_heads

_XAVIER = nn.initializers.xavier_uniform()
_CONV_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

SVTR_PRESETS = {
    "tiny": dict(embed_dims=(64, 128, 256), depths=(3, 6, 3), num_heads=(2, 4, 8)),
    "small": dict(embed_dims=(96, 192, 256), depths=(3, 6, 6), num_heads=(3, 6, 8)),
    "base": dict(embed_dims=(128, 256, 384), depths=(3, 6, 9), num_heads=(4, 8, 12)),
    "large": dict(embed_dims=(192, 256, 512), depths=(3, 9, 9), num_heads=(6, 8, 16)),
}


def local_neighborhood_mask(h: int, w: int, hk: int = 7, wk: int = 11) -> np.ndarray:
    """[H*W, H*W] bool, True where attention is allowed: |dh| <= hk//2 and
    |dw| <= wk//2 (reference build_local_mask semantics)."""
    hi = np.arange(h * w) // w
    wi = np.arange(h * w) % w
    dh = np.abs(hi[:, None] - hi[None, :])
    dw = np.abs(wi[:, None] - wi[None, :])
    return (dh <= hk // 2) & (dw <= wk // 2)


class MixingBlock(nn.Module):
    """Pre-LN MHSA (optionally local-masked) + MLP(4x) (reference :99-114)."""

    num_heads: int
    grid_hw: Tuple[int, int]
    local: bool = False
    local_k: Tuple[int, int] = (7, 11)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype, kernel_init=_XAVIER,
                       name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        mask = None
        if self.local:
            h, w = self.grid_hw
            mask = jnp.asarray(local_neighborhood_mask(h, w, *self.local_k))[None, None]
        out = multi_head_attention(_split_heads(q, self.num_heads),
                                   _split_heads(k, self.num_heads),
                                   _split_heads(v, self.num_heads),
                                   scale=head_dim**-0.5, mask=mask,
                                   out_dtype=self.dtype)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=_XAVIER, name="proj")(out)
        x = x + out
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        x = x + Mlp(4 * c, dtype=self.dtype, name="mlp")(y, deterministic=deterministic)
        return x


class SVTR(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, image, *, train: bool = False, use_masking: bool = False,
                 mask_mode: Optional[str] = None,
                 mask_ratio: Optional[float] = None,
                 return_features: bool = False,
                 sgm_batch: Optional[dict] = None):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        preset = SVTR_PRESETS[cfg.svtr_preset]
        dims, depths, heads = preset["embed_dims"], preset["depths"], preset["num_heads"]

        # Patch embedding: conv s2 -> BN -> relu, twice (reference :11-24).
        x = image.astype(dtype)
        x = nn.Conv(dims[0] // 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=dtype, kernel_init=_CONV_INIT, name="embed_conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="embed_bn1")(x).astype(dtype)
        x = nn.relu(x)
        x = nn.Conv(dims[0], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=dtype, kernel_init=_CONV_INIT, name="embed_conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="embed_bn2")(x).astype(dtype)
        x = nn.relu(x)

        b, h, w, _ = x.shape
        tokens = x.reshape(b, h * w, dims[0])

        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, dims[0]))
        if use_masking and cfg.masking.mode != "none":
            keep = masking.build_keep_mask(self.make_rng("mask"), b, h * w,
                                           cfg.masking, mode=mask_mode, ratio=mask_ratio)
            tokens = masking.apply_mask(tokens, keep, mask_token)

        hw = (h, w)
        for si in range(len(dims)):
            for j in range(depths[si]):
                tokens = MixingBlock(num_heads=heads[si], grid_hw=hw,
                                     local=j < depths[si] // 2, dtype=dtype,
                                     name=f"stage{si}_block{j}")(
                    tokens, deterministic=not train)
            if si < len(dims) - 1:
                # Merging: 3x3 conv stride (2,1) + LN (reference :133-152).
                hh, ww = hw
                y = tokens.reshape(b, hh, ww, dims[si])
                y = nn.Conv(dims[si + 1], (3, 3), strides=(2, 1),
                            padding=((1, 1), (1, 1)), dtype=dtype,
                            kernel_init=_CONV_INIT, name=f"merge{si}")(y)
                hw = (hh // 2, ww)
                tokens = y.reshape(b, hw[0] * hw[1], dims[si + 1])
                tokens = nn.LayerNorm(dtype=jnp.float32,
                                      name=f"merge{si}_norm")(tokens).astype(dtype)

        # Combining: mean over height, FC + GELU + drop (reference :116-130).
        hh, ww = hw
        feats = tokens.reshape(b, hh, ww, dims[-1]).mean(axis=1)
        feats = nn.Dense(dims[-1], dtype=dtype, kernel_init=_XAVIER,
                         name="combine_fc")(feats)
        feats = nn.gelu(feats, approximate=False)
        feats = nn.Dropout(0.1, deterministic=not train)(feats)

        # Anti-blank-collapse head bias init (reference :290-301).
        def head_bias_init(key, shape, dtype=jnp.float32):
            bias = jnp.full(shape, 0.1, dtype)
            return bias.at[0].set(-3.0)

        logits = nn.Dense(cfg.nb_cls, dtype=jnp.float32, kernel_init=_XAVIER,
                          bias_init=head_bias_init, name="head")(feats)

        if cfg.sgm.enable and sgm_batch is not None:
            from htr_vt_tpu.models.sgm import SGMHead
            f = jax.lax.stop_gradient(feats) if cfg.sgm.detach_features else feats
            sgm_loss = SGMHead(vocab_size=cfg.sgm.vocab_size,
                               char_emb_dim=cfg.sgm.char_emb_dim, dtype=dtype,
                               name="sgm_head")(
                f, sgm_batch["sgm_left"], sgm_batch["sgm_right"],
                sgm_batch["sgm_tgt"], sgm_batch["sgm_mask"],
                deterministic=not train)
            if return_features:
                return logits, feats, sgm_loss
            return logits, sgm_loss
        if return_features:
            return logits, feats
        return logits
