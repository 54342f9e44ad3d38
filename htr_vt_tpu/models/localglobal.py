"""Local-window and pooled-global attention blocks.

Covers model_sgm_localglobal (stack: plain 1-D window block, shifted window
block, two global blocks — model_sgm_localglobal/model/HTR_VT.py:97-260,
:364-375) and model_lgp (three parallel local||pooled-global fusion blocks —
model_lgp/model/plg.py:139-212).

Differences from the model_window attention (models/vit.py): no relative
position bias, and the shifted variant rolls cyclically *without* boundary
masks — preserved as the reference's semantics. The pooled-global path
average-pools tokens to a fixed budget G, attends there, linearly
interpolates back, and scales by a learned alpha gate (plg.py alpha_init).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from htr_vt_tpu.models.layers import Mlp
from htr_vt_tpu.models.vit import multi_head_attention, _split_heads

_XAVIER = nn.initializers.xavier_uniform()


def linear_resize_tokens(x: jax.Array, target_len: int) -> jax.Array:
    """Linear interpolation along the token axis, matching
    F.interpolate(mode='linear', align_corners=False)."""
    b, n, d = x.shape
    if n == target_len:
        return x
    coords = (jnp.arange(target_len) + 0.5) * (n / target_len) - 0.5
    lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    w = jnp.clip(coords - lo, 0.0, 1.0).astype(x.dtype)[None, :, None]
    return x[:, lo] * (1 - w) + x[:, hi] * w


class PlainWindowMHSA(nn.Module):
    """Non-overlapping 1-D window attention, optional unmasked cyclic shift
    (WindowMHSA1D, model_sgm_localglobal/model/HTR_VT.py:97-151)."""

    num_heads: int
    window_size: int = 12
    shift: int = 0
    qkv_bias: bool = True
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, n, c = x.shape
        w = self.window_size
        head_dim = c // self.num_heads
        s = self.shift % w if w > 0 else 0
        if s:
            x = jnp.roll(x, s, axis=1)
        pad = (w - n % w) % w
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        np_ = x.shape[1]

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=_XAVIER, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def windows(t):
            return _split_heads(t.reshape(b * np_ // w, w, c), self.num_heads)

        out = multi_head_attention(windows(q), windows(k), windows(v),
                                   scale=head_dim**-0.5, out_dtype=self.dtype)
        out = out.reshape(b, np_, c)[:, :n]
        if s:
            out = jnp.roll(out, -s, axis=1)
        out = nn.Dense(c, dtype=self.dtype, kernel_init=_XAVIER, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=deterministic)(out)


class PooledGlobalMHSA(nn.Module):
    """Avg-pool to G tokens -> LN (no affine) -> MHSA -> proj -> linear
    upsample -> alpha gate (PooledGlobalMHSA, localglobal:156-210 +
    plg.py alpha_init)."""

    num_heads: int
    g_tokens: int = 64
    qkv_bias: bool = True
    proj_drop: float = 0.0
    alpha_init: float = 0.4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, n, c = x.shape
        g = min(self.g_tokens, max(1, n))
        head_dim = c // self.num_heads
        if n % g == 0:
            z = x.reshape(b, g, n // g, c).mean(axis=2)
        else:
            z = linear_resize_tokens(x, g)
        z = nn.LayerNorm(use_bias=False, use_scale=False, dtype=jnp.float32,
                         name="pool_norm")(z).astype(self.dtype)
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=_XAVIER, name="qkv")(z)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        y = multi_head_attention(_split_heads(q, self.num_heads),
                                 _split_heads(k, self.num_heads),
                                 _split_heads(v, self.num_heads),
                                 scale=head_dim**-0.5, out_dtype=self.dtype)
        y = nn.Dense(c, dtype=self.dtype, kernel_init=_XAVIER, name="proj")(y)
        y = nn.Dropout(self.proj_drop, deterministic=deterministic)(y)
        y = linear_resize_tokens(y, n)
        alpha = self.param("alpha", nn.initializers.constant(self.alpha_init), ())
        return y * alpha.astype(y.dtype)


class LocalBlock1D(nn.Module):
    """Pre-LN window MHSA + MLP (LocalBlock1D, localglobal:212-228)."""

    num_heads: int
    window_size: int = 12
    shifted: bool = False
    mlp_ratio: float = 4.0
    drop: float = 0.0
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        d = x.shape[-1]
        norm = lambda name: nn.LayerNorm(epsilon=self.layer_norm_eps,
                                         dtype=jnp.float32, name=name)
        attn = PlainWindowMHSA(self.num_heads, self.window_size,
                               shift=self.window_size // 2 if self.shifted else 0,
                               proj_drop=self.drop, dtype=self.dtype, name="attn")
        x = x + attn(norm("norm1")(x).astype(self.dtype), deterministic=deterministic)
        mlp = Mlp(int(d * self.mlp_ratio), drop_rate=self.drop, dtype=self.dtype,
                  name="mlp")
        x = x + mlp(norm("norm2")(x).astype(self.dtype), deterministic=deterministic)
        return x


class LocalGlobalParallelBlock(nn.Module):
    """norm -> (window MHSA || alpha-gated pooled-global MHSA) -> concat ->
    fuse Dense -> +res -> norm -> MLP -> +res
    (LocalGlobalParallelBlockSimple, model_lgp/model/plg.py:172-212)."""

    num_heads: int
    window_size: int = 12
    g_tokens: int = 64
    mlp_ratio: float = 4.0
    drop: float = 0.0
    alpha_init: float = 0.4
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        d = x.shape[-1]
        norm = lambda name: nn.LayerNorm(epsilon=self.layer_norm_eps,
                                         dtype=jnp.float32, name=name)
        y = norm("norm1")(x).astype(self.dtype)
        y_loc = PlainWindowMHSA(self.num_heads, self.window_size, proj_drop=self.drop,
                                dtype=self.dtype, name="local_attn")(
            y, deterministic=deterministic)
        y_glb = PooledGlobalMHSA(self.num_heads, self.g_tokens, proj_drop=self.drop,
                                 alpha_init=self.alpha_init, dtype=self.dtype,
                                 name="global_attn")(y, deterministic=deterministic)
        fused = nn.Dense(d, dtype=self.dtype, kernel_init=_XAVIER, name="fuse")(
            jnp.concatenate([y_loc, y_glb], axis=-1))
        x = x + fused
        mlp = Mlp(int(d * self.mlp_ratio), drop_rate=self.drop, dtype=self.dtype,
                  name="mlp")
        x = x + mlp(norm("norm2")(x).astype(self.dtype), deterministic=deterministic)
        return x
