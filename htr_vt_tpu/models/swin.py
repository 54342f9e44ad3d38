"""HTR-VT-Swin: light ResNet -> three 2-D Swin stages with height-only patch
merging -> height pooling -> CTC head.

Re-design of model_sgm_mms_swin/model/HTR_VT.py: the truncated ResNet leaves
a [B, 4, 128, Cfe] map; a 1x1 projection lifts to d_model; token masking is
applied to the flattened 4x128 sequence; three Swin stages run at (4,128),
(2,128), (1,128) with (wh, ww) windows (4,8)/(2,8)/(1,8), alternating
unshifted / half-window-shifted blocks (the reference builds shifts
programmatically, _build_swin :358-380); HeightOnlyPatchMerging ((2,1) strided
conv + LN) doubles channels between stages (:186-204); Combining mean-pools
height and applies FC+GELU+drop (:206-220); a Linear head emits CTC logits.

Unlike the reference's lazy first-forward module construction (:317-336),
everything here is static config — shapes are known at trace time.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from htr_vt_tpu.config import ModelConfig
from htr_vt_tpu.models import masking
from htr_vt_tpu.models.layers import Mlp
from htr_vt_tpu.models.stem import ResNet18Stem
from htr_vt_tpu.models.vit import multi_head_attention

_XAVIER = nn.initializers.xavier_uniform()


def _rel_bias_index(wh: int, ww: int) -> np.ndarray:
    """Pairwise relative-position index inside a (wh, ww) window
    (WindowAttention2D, reference :49-66)."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # [wh*ww, wh*ww]


def _shift_mask(h: int, w: int, wh: int, ww: int, sh: int, sw: int) -> Optional[np.ndarray]:
    """Swin attention mask for cyclic shifts: tokens from different original
    regions must not attend to each other (reference _build_attn_mask)."""
    if sh == 0 and sw == 0:
        return None
    img = np.zeros((h, w), np.int32)
    cnt = 0
    h_slices = [(0, h - wh), (h - wh, h - sh), (h - sh, h)] if sh else [(0, h)]
    w_slices = [(0, w - ww), (w - ww, w - sw), (w - sw, w)] if sw else [(0, w)]
    for hs, he in h_slices:
        for ws, we in w_slices:
            img[hs:he, ws:we] = cnt
            cnt += 1
    wins = img.reshape(h // wh, wh, w // ww, ww).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, wh * ww)  # [nW, wh*ww]
    same = wins[:, :, None] == wins[:, None, :]
    return same  # [nW, N, N] bool, True = allowed


class SwinBlock2D(nn.Module):
    """LN -> (shifted) 2-D window attention w/ relative bias -> +res -> LN ->
    MLP -> +res (reference SwinBlock2D :98-181)."""

    num_heads: int
    input_hw: Tuple[int, int]
    window: Tuple[int, int]
    shift: Tuple[int, int] = (0, 0)
    mlp_ratio: float = 4.0
    drop: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h, w = self.input_hw
        wh, ww = self.window
        sh, sw = self.shift
        b, n, c = x.shape
        assert n == h * w, (n, h, w)
        num_heads = self.num_heads
        head_dim = c // num_heads

        shortcut = x
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        y = y.reshape(b, h, w, c)
        if sh or sw:
            y = jnp.roll(y, (-sh, -sw), axis=(1, 2))

        # window partition: [B * nWh * nWw, wh*ww, C]
        y = y.reshape(b, h // wh, wh, w // ww, ww, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(-1, wh * ww, c)

        qkv = nn.Dense(3 * c, dtype=self.dtype, kernel_init=_XAVIER, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(t.shape[0], wh * ww, num_heads, head_dim).transpose(0, 2, 1, 3)

        table = self.param("rel_bias", nn.initializers.truncated_normal(0.02),
                           ((2 * wh - 1) * (2 * ww - 1), num_heads))
        idx = jnp.asarray(_rel_bias_index(wh, ww))
        bias = table[idx.reshape(-1)].reshape(wh * ww, wh * ww, num_heads)
        bias = bias.transpose(2, 0, 1)[None]  # [1, H, N, N]

        mask_np = _shift_mask(h, w, wh, ww, sh, sw)
        mask = None
        if mask_np is not None:
            mask = jnp.tile(jnp.asarray(mask_np)[:, None], (b, 1, 1, 1))

        out = multi_head_attention(heads(q), heads(k), heads(v),
                                   scale=head_dim**-0.5, bias=bias, mask=mask,
                                   out_dtype=self.dtype)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=_XAVIER, name="proj")(out)

        # reverse partition + shift
        out = out.reshape(b, h // wh, w // ww, wh, ww, c).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, h, w, c)
        if sh or sw:
            out = jnp.roll(out, (sh, sw), axis=(1, 2))
        x = shortcut + out.reshape(b, n, c)

        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        x = x + Mlp(int(c * self.mlp_ratio), drop_rate=self.drop, dtype=self.dtype,
                    name="mlp")(y, deterministic=deterministic)
        return x


class HeightOnlyPatchMerging(nn.Module):
    """(2,1) strided conv + LN; halves height, doubles channels (reference :186-204)."""

    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        h, w = hw
        b, n, c = x.shape
        y = x.reshape(b, h, w, c)
        y = nn.Conv(self.out_dim, (2, 1), strides=(2, 1), padding="VALID",
                    use_bias=False, dtype=self.dtype, kernel_init=_XAVIER,
                    name="reduce")(y)
        h2 = h // 2
        y = y.reshape(b, h2 * w, self.out_dim)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(y).astype(self.dtype)
        return y, (h2, w)


class HTRSwin(nn.Module):
    """Standalone Swin recognizer (reference HTR_VT_Swin + create_model
    :455-475: d_model 192, depths (1,1,2), heads (6,6,6), windows
    (4,8)/(2,8)/(1,8), mlp_ratio 2)."""

    cfg: ModelConfig
    d_model: int = 192
    stage_depths: Sequence[int] = (1, 1, 2)
    stage_heads: Sequence[int] = (6, 6, 6)
    stage_windows: Sequence[Tuple[int, int]] = ((4, 8), (2, 8), (1, 8))
    mlp_ratio: float = 2.0
    drop: float = 0.0

    @nn.compact
    def __call__(self, image, *, train: bool = False, use_masking: bool = False,
                 mask_mode: Optional[str] = None,
                 mask_ratio: Optional[float] = None,
                 return_features: bool = False,
                 sgm_batch: Optional[dict] = None):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        d = self.d_model

        x = image.astype(jnp.float32)
        # Truncated resnet identical to the VAN variant's
        # (model_sgm_mms_swin/model/resnet18.py == van's): [B, 4, W/4, d/2].
        x = ResNet18Stem(embed_dim=d, dtype=dtype, widths=[d // 4, d // 2],
                         stage_strides=((2, 2), (2, 2)), final_maxpool=False,
                         name="stem")(x, train=train)
        x = nn.Conv(d, (1, 1), use_bias=False, dtype=dtype, name="proj")(x)
        b, h, w, _ = x.shape
        tokens = x.reshape(b, h * w, d)

        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, d))
        if use_masking and cfg.masking.mode != "none":
            keep = masking.build_keep_mask(self.make_rng("mask"), b, h * w,
                                           cfg.masking, mode=mask_mode, ratio=mask_ratio)
            tokens = masking.apply_mask(tokens, keep, mask_token)

        hw = (h, w)
        dim = d
        for si, (depth, heads, win) in enumerate(
                zip(self.stage_depths, self.stage_heads, self.stage_windows)):
            for i in range(depth):
                shift = (0, 0) if i % 2 == 0 else (win[0] // 2, win[1] // 2)
                tokens = SwinBlock2D(num_heads=heads, input_hw=hw, window=win,
                                     shift=shift, mlp_ratio=self.mlp_ratio,
                                     drop=self.drop, dtype=dtype,
                                     name=f"stage{si}_block{i}")(
                    tokens, deterministic=not train)
            if si < 2:
                tokens, hw = HeightOnlyPatchMerging(dim * 2, dtype=dtype,
                                                    name=f"merge{si}")(tokens, hw)
                dim *= 2

        # Combining: mean-pool height, FC + GELU + drop (reference :206-220).
        hh, ww_ = hw
        feats = tokens.reshape(b, hh, ww_, dim).mean(axis=1)
        feats = nn.Dense(dim, dtype=dtype, kernel_init=_XAVIER, name="combine_fc")(feats)
        feats = nn.gelu(feats, approximate=False)
        feats = nn.Dropout(0.1, deterministic=not train)(feats)

        logits = nn.Dense(cfg.nb_cls, dtype=jnp.float32, kernel_init=_XAVIER,
                          name="head")(feats)

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
