"""Encoder recipes: one registered builder per reference variant.

Each builder returns the list of token-mixing blocks for HTRVT. Implemented
recipes (round 1): vit (model_v1), window (model_window). Further variants
(macaron, localglobal, lgp, conformer, squeezeformer, van) register here as
they land; swin and svtr are standalone models in their own modules.
"""

from __future__ import annotations

import jax.numpy as jnp

from htr_vt_tpu.config import ModelConfig
from htr_vt_tpu.models.layers import drop_path_schedule
from htr_vt_tpu.models.registry import register_encoder
from htr_vt_tpu.models.vit import Block


@register_encoder("vit")
def vit_blocks(cfg: ModelConfig):
    """model_v1: `depth` global-attention pre-norm blocks (model_v1/model/HTR_VT.py:164-167)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    return [
        Block(num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
              drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
              layer_norm_eps=cfg.layer_norm_eps, attention="global", dtype=dtype,
              name=f"block{i}")
        for i in range(cfg.depth)
    ]


@register_encoder("window")
def window_blocks(cfg: ModelConfig):
    """model_window: first `num_window_blocks` blocks use 1-D windowed attention
    with relative position bias, odd ones shifted by window//2 Swin-style; the
    rest are global. Linearly increasing drop-path schedule
    (model_window/model/HTR_VT.py:114-154,263-278)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    dps = drop_path_schedule(cfg.drop_path_rate, cfg.depth)
    blocks = []
    for i in range(cfg.depth):
        if i < cfg.num_window_blocks:
            kind = "window_shifted" if i % 2 == 1 else "window"
        else:
            kind = "global"
        blocks.append(
            Block(num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
                  qkv_bias=cfg.qkv_bias, drop=cfg.drop_rate,
                  attn_drop=cfg.attn_drop_rate, drop_path=dps[i],
                  layer_norm_eps=cfg.layer_norm_eps, attention=kind,
                  window_size=cfg.window_size, dtype=dtype, name=f"block{i}"))
    return blocks
