"""The HTR-VT model: ResNet stem -> token masking -> transformer encoder -> CTC head.

One shared implementation hosting every reference variant as a config
(reference flagship: model_v1/model/HTR_VT.py:139-254). Forward pipeline, with
shapes for the standard 512x64 line image:

    image [B, 64, 512, 1] (NHWC, float32 in [0,1])
    -> parameterless LayerNorm over the whole image        (:224)
    -> ResNet18 stem -> [B, 1, 128, D]                     (:225)
    -> tokens [B, 128, D]                                  (:226-227)
    -> span/random/block/MMS masking (train only)          (:229-230)
    -> + fixed 2-D sin-cos positional embedding            (:231)
    -> encoder blocks (variant-specific stack)             (:233-234)
    -> LayerNorm -> Dense(nb_cls)                          (:236-238)
    -> parameterless LayerNorm over logits                 (:239)

TPU notes: all matmuls run in cfg.compute_dtype (bfloat16 by default) on the
MXU; norms, softmax and the logits are float32. Shapes are fully static so XLA
compiles exactly one program for train and one for eval.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from htr_vt_tpu.config import ModelConfig
from htr_vt_tpu.models import masking
from htr_vt_tpu.models.layers import global_layer_norm, sincos_pos_embed_2d
from htr_vt_tpu.models.registry import build_encoder_blocks
from htr_vt_tpu.models.sgm import SGMHead
from htr_vt_tpu.models.stem import ResNet18Stem


def _stage1_pad_applies(cfg) -> bool:
    """The int8 stage1 pad applies only where it buys tiling: a stage1 width
    that is >= 128 but off the 128-lane grid (the flagship's 192), padded UP
    to quant_stage1_pad. Tiny test models (stage1 16-64 ch) and already-
    aligned widths keep their native tree."""
    s1 = cfg.embed_dim // 4
    return (cfg.quant == "int8" and bool(cfg.quant_stage1_pad)
            and s1 >= 128 and s1 % 128 != 0 and cfg.quant_stage1_pad > s1)


class HTRVT(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, image: jax.Array, *, train: bool = False,
                 use_masking: bool = False, mask_mode: Optional[str] = None,
                 mask_ratio: Optional[float] = None,
                 return_features: bool = False, sgm_batch: Optional[dict] = None):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)

        x = image.astype(jnp.float32)
        if cfg.input_layer_norm:
            x = global_layer_norm(x)

        # Rematerialization (cfg.remat): under "all"/"blocks" the training
        # trace wraps stem / encoder blocks in jax.checkpoint so their
        # activations are recomputed in the backward instead of held in HBM
        # — the stem's [B, H/2, W, C] tensors dominate the footprint. `train`
        # / `deterministic` stay Python-static by closing over them.
        remat_stem = train and cfg.remat == "all"
        remat_blocks = train and cfg.remat in ("blocks", "all")

        if cfg.stem in ("van", "van2"):
            from htr_vt_tpu.models.van import VanStem
            stem = VanStem(embed_dim=cfg.embed_dim, variant=cfg.stem,
                           dtype=dtype, name="stem")
        else:
            # int8 serving with quant_stage1_pad: stage1 runs physically at
            # the padded width (kernels/BN zero-padded — logits exactly
            # preserved, ops/quant.py:pad_stage1_tree) so its convs satisfy
            # _int8_pays' 256-channel tiling floor. quant configs are
            # serving-only, so the module-level width is safe to derive from
            # cfg.quant alone.
            widths = None
            if _stage1_pad_applies(cfg):
                widths = (cfg.quant_stage1_pad, cfg.embed_dim // 2,
                          cfg.embed_dim)
            stem = ResNet18Stem(embed_dim=cfg.embed_dim, dtype=dtype,
                                conv_impl=cfg.conv_impl, pool_impl=cfg.pool_impl,
                                bn_stats_impl=cfg.bn_stats_impl,
                                quant=cfg.quant == "int8" and not train,
                                dataflow=cfg.conv_dataflow,
                                widths=widths,
                                name="stem")
        if remat_stem:
            x = nn.remat(lambda mdl, t: mdl(t, train=train))(stem, x)
        else:
            x = stem(x, train=train)
        b = x.shape[0]
        tokens = x.reshape(b, -1, cfg.embed_dim)  # [B, N, D]
        n = tokens.shape[1]

        # Learned mask token (model_v1/model/HTR_VT.py:161,187); created
        # unconditionally so init() without masking still owns the parameter.
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, cfg.embed_dim))
        if use_masking and cfg.masking.mode != "none":
            keep = masking.build_keep_mask(
                self.make_rng("mask"), b, n, cfg.masking, mode=mask_mode, ratio=mask_ratio)
            tokens = masking.apply_mask(tokens, keep, mask_token)

        if cfg.use_abs_pos_embed:
            # VAN stems emit a purely sequential token row; the reference
            # rebuilds a (1, N) sin-cos embedding for it
            # (model_sgm_mms_attach_van/model/HTR_VT.py:450-457).
            grid = (1, n) if cfg.stem in ("van", "van2") else cfg.grid_size
            pos = sincos_pos_embed_2d(cfg.embed_dim, grid)  # static numpy
            tokens = tokens + jnp.asarray(pos, dtype)[None, :n]

        # Quantization is inference-only: the training trace always builds
        # the float encoder regardless of cfg.quant.
        enc_cfg = cfg
        if train and cfg.quant != "none":
            import dataclasses
            enc_cfg = dataclasses.replace(cfg, quant="none")
        for block in build_encoder_blocks(enc_cfg):
            if remat_blocks:
                tokens = nn.remat(
                    lambda mdl, t: mdl(t, deterministic=not train))(block, tokens)
            else:
                tokens = block(tokens, deterministic=not train)

        feats = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name="norm")(tokens)
        logits = nn.Dense(cfg.nb_cls, dtype=jnp.float32,
                          kernel_init=nn.initializers.xavier_uniform(),
                          name="head")(feats)
        if cfg.logit_layer_norm:
            logits = global_layer_norm(logits)

        # Training-only SGM auxiliary loss (model_sgm_* variants); the head's
        # parameters live in the same tree so SAM/AdamW/EMA treat them exactly
        # like the reference's shared param group (model_sgm_2/train.py:144-158).
        if cfg.sgm.enable and sgm_batch is not None:
            f = jax.lax.stop_gradient(feats) if cfg.sgm.detach_features else feats
            sgm_loss = SGMHead(vocab_size=cfg.sgm.vocab_size,
                               char_emb_dim=cfg.sgm.char_emb_dim,
                               dtype=dtype, name="sgm_head")(
                f, sgm_batch["sgm_left"], sgm_batch["sgm_right"],
                sgm_batch["sgm_tgt"], sgm_batch["sgm_mask"],
                deterministic=not train)
            if return_features:
                return logits, feats, sgm_loss
            return logits, sgm_loss

        if return_features:
            return logits, feats
        return logits


def build_model(cfg: ModelConfig) -> nn.Module:
    """Model factory over the whole zoo: HTRVT hosts the block-recipe
    encoders; Swin and SVTR restructure the stem/stage layout and are
    standalone modules; encoder_decoder wraps the trunk with an
    autoregressive decoder."""
    if cfg.model_type == "encoder_decoder":
        from htr_vt_tpu.models.encoder_decoder import HTREncoderDecoder
        return HTREncoderDecoder(cfg, vocab_size=cfg.ed_vocab_size,
                                 decoder_layers=cfg.decoder_layers,
                                 decoder_heads=cfg.decoder_heads,
                                 max_seq_len=cfg.max_seq_len)
    if cfg.encoder == "swin":
        from htr_vt_tpu.models.swin import HTRSwin
        return HTRSwin(cfg)
    if cfg.encoder == "svtr":
        from htr_vt_tpu.models.svtr import SVTR
        return SVTR(cfg)
    return HTRVT(cfg)


def create_model(nb_cls: int = 80, img_size=(64, 512), **overrides) -> HTRVT:
    """Factory matching the reference's hard-coded flagship hyperparameters
    (model_v1/model/HTR_VT.py:244-254): patch (4,64), dim 768, depth 4, heads 6."""
    import dataclasses
    cfg = ModelConfig(nb_cls=nb_cls, img_size=tuple(img_size))
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return HTRVT(cfg)
