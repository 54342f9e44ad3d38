"""Encoder recipes: one registered builder per reference variant.

Each builder returns the list of token-mixing blocks for HTRVT. Implemented
recipes: vit (model_v1), window (model_window), macaron / macaron_2
(model_sgm_macaron*), localglobal (model_sgm_localglobal), lgp (model_lgp),
conformer (model_sgm_mms_conv), squeezeformer (model_sgm_mms_conv_squeeze).
Swin and SVTR restructure the whole model (different stems/merging), so they
are standalone model classes in their own modules, not block recipes.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from htr_vt_tpu.config import ModelConfig
from htr_vt_tpu.models.conv_blocks import (ConformerBlock, ConvLocalMixer1D,
                                           SqueezeFormerEncoder)
from htr_vt_tpu.models.layers import drop_path_schedule
from htr_vt_tpu.models.localglobal import LocalBlock1D, LocalGlobalParallelBlock
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
              quant=cfg.quant == "int8", attn_impl=cfg.attn_impl,
              quick_gelu=cfg.quant_gelu == "quick", name=f"block{i}")
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
                  window_size=cfg.window_size,
                  # the reference's GLOBAL blocks carry a full-sequence
                  # relative position bias table too
                  # (model_window/model/HTR_VT.py:23-31,44-47)
                  rel_bias_len=cfg.num_tokens,
                  dtype=dtype, name=f"block{i}"))
    return blocks


def _global_block(cfg: ModelConfig, i: int, drop=0.0, attn_drop=0.0,
                  mlp_ratio=None, num_heads=None):
    return Block(num_heads=num_heads or cfg.num_heads,
                 mlp_ratio=mlp_ratio or cfg.mlp_ratio, qkv_bias=True,
                 drop=drop, attn_drop=attn_drop,
                 layer_norm_eps=cfg.layer_norm_eps, attention="global",
                 attn_impl=cfg.attn_impl,
                 dtype=jnp.dtype(cfg.compute_dtype), name=f"block{i}")


@register_encoder("macaron")
def macaron_blocks(cfg: ModelConfig):
    """model_sgm_macaron: two ConvLocalMixer1D (k=7, drop 0.1) ahead of 4
    global blocks with drop=attn_drop=0.1, mlp_ratio 3
    (model_sgm_macaron/model/HTR_VT.py:302-316)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    mixers = [ConvLocalMixer1D(kernel_size=cfg.macaron_kernel, drop_rate=0.1,
                               dtype=dtype, name=f"mixer{i}")
              for i in range(cfg.num_macaron_blocks)]
    blocks = [_global_block(cfg, i, drop=0.1, attn_drop=0.1, mlp_ratio=3.0)
              for i in range(cfg.depth)]
    return mixers + blocks


@register_encoder("macaron_2")
def macaron2_blocks(cfg: ModelConfig):
    """model_sgm_macaron_2: same mixers; global blocks with heads 4,
    mlp_ratio 4, no dropout (diff at model/HTR_VT.py:309-316)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    mixers = [ConvLocalMixer1D(kernel_size=cfg.macaron_kernel, drop_rate=0.1,
                               dtype=dtype, name=f"mixer{i}")
              for i in range(cfg.num_macaron_blocks)]
    blocks = [_global_block(cfg, i, mlp_ratio=4.0, num_heads=4)
              for i in range(cfg.depth)]
    return mixers + blocks


@register_encoder("localglobal")
def localglobal_blocks(cfg: ModelConfig):
    """model_sgm_localglobal: [local window, local shifted, global, global]
    with window 12 (model_sgm_localglobal/model/HTR_VT.py:364-375)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    return [
        LocalBlock1D(cfg.num_heads, cfg.local_window, shifted=False,
                     mlp_ratio=cfg.mlp_ratio, layer_norm_eps=cfg.layer_norm_eps,
                     dtype=dtype, name="block0"),
        LocalBlock1D(cfg.num_heads, cfg.local_window, shifted=True,
                     mlp_ratio=cfg.mlp_ratio, layer_norm_eps=cfg.layer_norm_eps,
                     dtype=dtype, name="block1"),
        _global_block(cfg, 2),
        _global_block(cfg, 3),
    ]


@register_encoder("lgp")
def lgp_blocks(cfg: ModelConfig):
    """model_lgp: every block is a parallel local||pooled-global fusion block
    (window 12, G=64, alpha 0.4) — model_lgp/model/plg.py:172-212; the lgp
    config uses depth 3."""
    dtype = jnp.dtype(cfg.compute_dtype)
    return [
        LocalGlobalParallelBlock(cfg.num_heads, cfg.local_window,
                                 g_tokens=cfg.global_pool_len,
                                 mlp_ratio=cfg.mlp_ratio,
                                 layer_norm_eps=cfg.layer_norm_eps,
                                 dtype=dtype, name=f"block{i}")
        for i in range(cfg.depth)
    ]


@register_encoder("lgp_svtr")
def lgp_svtr_blocks(cfg: ModelConfig):
    """model_lgp/model/svtr_mixing.py SVTRLGMixer (present upstream but never
    wired into create_model): ``num_window_blocks`` NON-shifted local-window
    mixing blocks followed by global mixing blocks, all pre-LN MHSA + 4x MLP
    (LocalMixing/GlobalMixing, svtr_mixing.py:112-171). The reference's
    (7,11) spatial windows degenerate to 1-D width-11 windows on the stem's
    H=1 token grid — its non-overlapping window partition with edge padding
    is exactly this module's "window" attention (models/vit.py). One
    documented deviation: the window blocks carry the 1-D learned relative
    position bias (initialized ~0) the reference mixer lacks — a strict
    superset. Wired and tested here, unlike upstream."""
    dtype = jnp.dtype(cfg.compute_dtype)
    return [
        Block(num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio, qkv_bias=True,
              drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
              layer_norm_eps=cfg.layer_norm_eps,
              attention="window" if i < cfg.num_window_blocks else "global",
              window_size=cfg.window_size, dtype=dtype, name=f"block{i}")
        for i in range(cfg.depth)
    ]


@register_encoder("conformer")
def conformer_blocks(cfg: ModelConfig):
    """model_sgm_mms_conv: Conformer blocks (half-FFN/MHSA/ConvModule/half-FFN)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    return [ConformerBlock(num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
                           conv_kernel=cfg.conv_kernel,
                           layer_norm_eps=cfg.layer_norm_eps, dtype=dtype,
                           quant=cfg.quant == "int8",
                           quick_gelu=cfg.quant_gelu == "quick",
                           attn_impl=cfg.attn_impl,
                           name=f"block{i}")
            for i in range(cfg.depth)]


@register_encoder("squeezeformer")
def squeezeformer_blocks(cfg: ModelConfig):
    """model_sgm_mms_conv_squeeze: two-stage temporal U-Net of SE-gated
    Conformer blocks — stage1 at N tokens, avg-pool downsample to N/2,
    stage2, nearest upsample + skip, out-norm (SqueezeFormerEncoder,
    model/HTR_VT.py:288-363; instantiated :569-584 with ff/attn/conv
    dropout 0.1, kernel 3, se 0.25, drop_path 0.1)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    return [SqueezeFormerEncoder(
        num_heads=cfg.num_heads, depth=cfg.depth, mlp_ratio=cfg.mlp_ratio,
        conv_kernel=cfg.conv_kernel, drop_path_total=cfg.drop_path_rate,
        layer_norm_eps=cfg.layer_norm_eps, dtype=dtype,
        quant=cfg.quant == "int8", quick_gelu=cfg.quant_gelu == "quick",
        attn_impl=cfg.attn_impl, name="encoder")]


# ---------------------------------------------------------------------------
# Per-variant ModelConfig presets (the reference hard-codes these in each
# variant's create_model; here they are data).
# ---------------------------------------------------------------------------
VARIANT_PRESETS = {
    "vit": {},
    "window": dict(use_abs_pos_embed=False, logit_layer_norm=False,
                   drop_path_rate=0.1),
    "macaron": {},
    "macaron_2": {},
    "localglobal": {},
    "lgp": dict(depth=3),
    # SVTRLGMixer defaults: num_local=3 + num_global=3, window (7,11) -> 1-D
    # width 11 at H=1 (svtr_mixing.py:142-158).
    "lgp_svtr": dict(depth=6, num_window_blocks=3, window_size=11),
    # The conformer/squeezeformer references apply patch_embed directly to
    # the raw image — no parameterless input LN (model_sgm_mms_conv/model/
    # HTR_VT.py:617-622 forward_features; round-5 parity fix). Logit LN and
    # the fixed sin-cos pos embed stay.
    "conformer": dict(input_layer_norm=False),
    # drop_path_total=0.1 (reference create_model default drop_path,
    # model_sgm_mms_conv_squeeze/model/HTR_VT.py:552).
    "squeezeformer": dict(drop_path_rate=0.1, input_layer_norm=False),
    "van": dict(stem="van"),
    "van2": dict(stem="van2"),
    "swin": {},
    "svtr": {},
}


def apply_variant_preset(cfg: ModelConfig) -> ModelConfig:
    preset = VARIANT_PRESETS.get(cfg.encoder, {})
    return dataclasses.replace(cfg, **preset) if preset else cfg


@register_encoder("van")
def van_blocks(cfg: ModelConfig):
    """model_sgm_mms_attach_van: VAN height-reducer stem (cfg.stem='van') +
    the baseline global ViT stack (model_sgm_mms_attach_van/model/HTR_VT.py:297-301)."""
    return vit_blocks(cfg)


@register_encoder("van2")
def van2_blocks(cfg: ModelConfig):
    """model_sgm_mms_attach_van_2: same, with the wider-downsampling resnet."""
    return vit_blocks(cfg)
