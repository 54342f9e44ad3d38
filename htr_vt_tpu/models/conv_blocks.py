"""Convolutional sequence-mixing blocks: macaron conv mixers, Conformer,
SqueezeFormer.

Covers three reference variant families with shared primitives:
- model_sgm_macaron(_2): ConvLocalMixer1D x2 ahead of the ViT stack
  (model_sgm_macaron/model/HTR_VT.py:148-181).
- model_sgm_mms_conv: Conformer blocks (half-FFN -> MHSA -> ConvModule ->
  half-FFN -> LN) with a GLU'd depthwise ConvModule using GroupNorm
  (model_sgm_mms_conv/model/HTR_VT.py:117-240).
- model_sgm_mms_conv_squeeze: adds SqueezeExcite1D gating and sequence
  down/up-sampling (model_sgm_mms_conv_squeeze/model/HTR_VT.py:169-230).

Depthwise 1-D convs are expressed as feature-grouped ``nn.Conv`` over the
token axis — XLA maps them to efficient VPU/MXU code with NWC layout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from htr_vt_tpu.models.layers import DropPath, Mlp

_XAVIER = nn.initializers.xavier_uniform()


def _glu(x: jax.Array, axis: int = -1) -> jax.Array:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


class ConvLocalMixer1D(nn.Module):
    """LN -> Dense(2D) -> GLU -> depthwise conv(k) -> BN -> SiLU -> Dense -> drop,
    residual (model_sgm_macaron/model/HTR_VT.py:148-181)."""

    kernel_size: int = 7
    drop_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, train: Optional[bool] = None):
        train = (not deterministic) if train is None else train
        d = x.shape[-1]
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        y = nn.Dense(2 * d, dtype=self.dtype, kernel_init=_XAVIER, name="pw_in")(y)
        y = _glu(y)
        y = nn.Conv(d, (self.kernel_size,), padding="SAME", feature_group_count=d,
                    dtype=self.dtype, name="dwconv")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(y).astype(self.dtype)
        y = nn.silu(y)
        y = nn.Dense(d, dtype=self.dtype, kernel_init=_XAVIER, name="pw_out")(y)
        y = nn.Dropout(self.drop_rate, deterministic=deterministic)(y)
        return x + y


class ConvModule(nn.Module):
    """Conformer conv module: LN -> pw conv -> GLU -> dw conv -> GroupNorm(1)
    -> SiLU -> pw conv -> drop, residual inside
    (model_sgm_mms_conv/model/HTR_VT.py:117-166)."""

    kernel_size: int = 3
    drop_rate: float = 0.1
    drop_path: float = 0.0
    expansion: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16
    quant: bool = False  # int8 pointwise convs (serving; dw conv stays float
    # — depthwise work is bandwidth-bound, int8 matmul rate doesn't apply)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        from htr_vt_tpu.models.layers import QDense
        d = x.shape[-1]
        hidden = int(d * self.expansion)
        use_glu = hidden % 2 == 0
        inner = hidden // 2 if use_glu else hidden

        # eps 1e-5: the reference ConvModule uses torch's LayerNorm default
        # (model_sgm_mms_conv/model/HTR_VT.py:126), unlike the 1e-6 block
        # norms built via partial(nn.LayerNorm, eps=1e-6)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm")(x).astype(self.dtype)
        y = QDense(hidden, dtype=self.dtype, quant=self.quant,
                   kernel_init=nn.initializers.lecun_normal(),
                   name="pw1")(y)  # 1x1 conv == Dense
        if use_glu:
            y = _glu(y)
        y = nn.Conv(inner, (self.kernel_size,), padding="SAME",
                    feature_group_count=inner, dtype=self.dtype, name="dw")(y)
        y = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=jnp.float32,
                         name="gn")(y).astype(self.dtype)
        y = nn.silu(y)
        y = QDense(d, dtype=self.dtype, quant=self.quant,
                   kernel_init=nn.initializers.lecun_normal(), name="pw2")(y)
        y = nn.Dropout(self.drop_rate, deterministic=deterministic)(y)
        y = DropPath(self.drop_path, name="dp")(y, deterministic=deterministic)
        return x + y


class SqueezeExcite1D(nn.Module):
    """Mean-pool over tokens, two-layer gate, channel-wise sigmoid scaling
    (model_sgm_mms_conv_squeeze/model/HTR_VT.py:169-189)."""

    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        hidden = max(8, int(d * self.se_ratio))
        s = x.mean(axis=1).astype(self.dtype)
        s = nn.Dense(hidden, dtype=self.dtype, name="fc1")(s)
        s = nn.silu(s)
        s = nn.Dense(d, dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s)[:, None, :].astype(x.dtype)


def downsample_tokens(x: jax.Array) -> jax.Array:
    """Average-pool the token axis by 2 (Downsample1D, :190-207)."""
    b, n, d = x.shape
    if n <= 1:
        return x
    return x.reshape(b, n // 2, 2, d).mean(axis=2)


def upsample_tokens(x: jax.Array, target_len: int) -> jax.Array:
    """Nearest-neighbor upsample back to target_len (Upsample1D, :209-225)."""
    b, n, d = x.shape
    if n == target_len:
        return x
    reps = target_len // n
    return jnp.repeat(x, reps, axis=1)[:, :target_len]


class SqueezeFormerEncoder(nn.Module):
    """Two-stage temporal U-Net SqueezeFormer encoder
    (model_sgm_mms_conv_squeeze/model/HTR_VT.py:288-363):

        stage1 (d1 = depth//2 SE-gated Conformer blocks at N tokens)
        -> avg-pool downsample to N/2
        -> stage2 (d2 = depth - d1 blocks at N/2)
        -> nearest upsample back to N  + skip from stage1
        -> affine LayerNorm

    Drop-path follows the reference's linspace(0, drop_path_total, depth)
    split across the two stages. Presents the standard block interface so it
    slots into HTRVT's encoder stack as a single unit."""

    num_heads: int
    depth: int = 4
    mlp_ratio: float = 4.0
    ff_drop: float = 0.1
    attn_drop: float = 0.1
    conv_drop: float = 0.1
    conv_kernel: int = 3
    se_ratio: float = 0.25
    drop_path_total: float = 0.1
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16
    quant: bool = False
    quick_gelu: bool = False
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        d1 = max(1, self.depth // 2)
        d2 = max(1, self.depth - d1)
        import numpy as np
        dpr = np.linspace(0.0, self.drop_path_total, self.depth)

        def block(i, dp, name):
            return ConformerBlock(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                ff_drop=self.ff_drop, attn_drop=self.attn_drop,
                conv_drop=self.conv_drop, conv_kernel=self.conv_kernel,
                drop_path=float(dp), use_se=True,
                layer_norm_eps=self.layer_norm_eps, dtype=self.dtype,
                quant=self.quant, quick_gelu=self.quick_gelu,
                attn_impl=self.attn_impl, name=name)

        n0 = x.shape[1]
        for i in range(d1):
            x = block(i, dpr[i], f"stage1_block{i}")(x, deterministic=deterministic)
        skip = x
        x = downsample_tokens(x)
        for i in range(d2):
            x = block(i, dpr[d1 + i] if d1 + i < self.depth else 0.0,
                      f"stage2_block{i}")(x, deterministic=deterministic)
        x = upsample_tokens(x, n0)
        x = x + skip
        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=jnp.float32,
                            name="out_norm")(x).astype(x.dtype)


class FeedForward(nn.Module):
    """Conformer position-wise FFN: lin1 -> SiLU -> lin2 -> dropout
    (model_sgm_mms_conv/model/HTR_VT.py:103-114 — note SiLU, not the ViT
    Mlp's GELU; round-5 parity fix, the conformer/squeezeformer families
    previously reused Mlp and deviated from the reference activation)."""

    hidden_dim: int
    drop_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        from htr_vt_tpu.models.layers import QDense
        d = x.shape[-1]
        y = QDense(self.hidden_dim, dtype=self.dtype, quant=self.quant,
                   name="lin1")(x)
        y = nn.silu(y)
        y = QDense(d, dtype=self.dtype, quant=self.quant, name="lin2")(y)
        return nn.Dropout(self.drop_rate, deterministic=deterministic)(y)


class ConformerBlock(nn.Module):
    """Half-FFN -> MHSA -> ConvModule -> half-FFN -> final LN
    (model_sgm_mms_conv/model/HTR_VT.py:228+); macaron-halved FFNs scaled 0.5.
    With ``use_se`` it becomes the SqueezeFormer block (SE after conv,
    model_sgm_mms_conv_squeeze SqueezeConformerBlock)."""

    num_heads: int
    mlp_ratio: float = 4.0
    ff_drop: float = 0.1
    attn_drop: float = 0.0
    conv_drop: float = 0.1
    conv_kernel: int = 3
    drop_path: float = 0.0
    use_se: bool = False
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16
    quant: bool = False  # int8 QKV/proj/FFN/pointwise matmuls (serving)
    quick_gelu: bool = False
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        from htr_vt_tpu.models.vit import Attention
        d = x.shape[-1]
        norm = lambda name: nn.LayerNorm(epsilon=self.layer_norm_eps,
                                         dtype=jnp.float32, name=name)
        dp = DropPath(self.drop_path, name="dp")

        ff1 = FeedForward(int(d * self.mlp_ratio), drop_rate=self.ff_drop,
                          dtype=self.dtype, quant=self.quant, name="ffn1")
        x = x + dp(0.5 * ff1(norm("ffn1_norm")(x).astype(self.dtype),
                             deterministic=deterministic),
                   deterministic=deterministic)

        attn = Attention(self.num_heads, qkv_bias=True, attn_drop=self.attn_drop,
                         proj_drop=self.ff_drop, dtype=self.dtype,
                         quant=self.quant, attn_impl=self.attn_impl, name="attn")
        x = x + dp(attn(norm("attn_norm")(x).astype(self.dtype),
                        deterministic=deterministic),
                   deterministic=deterministic)

        x = ConvModule(kernel_size=self.conv_kernel, drop_rate=self.conv_drop,
                       drop_path=self.drop_path, dtype=self.dtype,
                       quant=self.quant,
                       name="conv")(x, deterministic=deterministic)
        if self.use_se:
            x = SqueezeExcite1D(dtype=self.dtype, name="se")(x)

        ff2 = FeedForward(int(d * self.mlp_ratio), drop_rate=self.ff_drop,
                          dtype=self.dtype, quant=self.quant, name="ffn2")
        x = x + dp(0.5 * ff2(norm("ffn2_norm")(x).astype(self.dtype),
                             deterministic=deterministic),
                   deterministic=deterministic)
        return norm("final_norm")(x).astype(x.dtype)
