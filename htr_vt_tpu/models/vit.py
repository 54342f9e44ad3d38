"""ViT encoder blocks.

Re-designs the reference's global-attention Block (model_v1/model/HTR_VT.py:11-83)
and the windowed / shifted relative-position-bias attention of model_window
(model_window/model/HTR_VT.py:23-47,114-154) for TPU: fused QKV projection onto
the MXU in bfloat16, float32 softmax, and window partitioning via static
reshapes (no Python loops, no dynamic shapes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from htr_vt_tpu.models.layers import DropPath, LayerScale, Mlp

_XAVIER = nn.initializers.xavier_uniform()


def _split_heads(x, num_heads):
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def resolve_attn_impl(impl: str, n: int, head_dim: int,
                      fused: bool = False) -> str:
    """Pick the attention implementation for a global-attention site.

    "flash" is the Pallas TPU flash-attention kernel
    (jax.experimental.pallas.ops.tpu.flash_attention): streaming softmax over
    key blocks, so the [B, H, N, N] attention matrix never touches HBM. At
    the flagship's N=128 that matrix is small and XLA's fused emitter wins;
    at the long width buckets (N=256 for 1024 px, N=512 for 2048 px,
    cli/serve.py --width-buckets) it is the dominant HBM tensor — e.g.
    [128, 6, 512, 512] f32 = 805 MB per layer per pass — which is what the
    kernel eliminates. "auto" therefore selects flash on TPU when N >= 256
    and the shape satisfies the kernel's block constraints (N and head_dim
    multiples of 128); anything fused (bias / mask / dropout inside the
    attention) stays on XLA.
    """
    if impl == "xla":
        return "xla"
    if impl == "flash":
        if jax.default_backend() != "tpu":
            raise ValueError("attn_impl='flash' is the Pallas TPU kernel; "
                             "use 'xla' (or 'auto') on this backend")
        if fused:
            raise ValueError("attn_impl='flash' cannot fuse bias/mask/dropout "
                             "inside attention at this site; use 'xla' or "
                             "'auto' (auto routes fused sites to XLA)")
        if n % 128 or head_dim % 128:
            raise ValueError(
                f"attn_impl='flash' needs N and head_dim to be multiples of "
                f"128 (kernel block constraint); got N={n}, head_dim="
                f"{head_dim} — use 'auto' to fall back to XLA on such shapes")
        return "flash"
    if impl != "auto":
        raise ValueError(f"unknown attn_impl {impl!r} (auto | xla | flash)")
    if fused or n < 256 or n % 128 or head_dim % 128:
        return "xla"
    return "flash" if jax.default_backend() == "tpu" else "xla"


def flash_mha(q, k, v, scale: float, out_dtype=jnp.bfloat16):
    """Flash attention: same contract as multi_head_attention (bias/mask-free).

    q,k,v: [B, H, N, D] -> [B, N, H*D]."""
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention
    out = flash_attention(q, k, v, sm_scale=scale)
    b, h, n, d = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, n, h * d).astype(out_dtype)


def multi_head_attention(q, k, v, scale: float, bias: Optional[jax.Array] = None,
                         mask: Optional[jax.Array] = None, out_dtype=jnp.bfloat16):
    """softmax(q k^T * scale + bias) v with float32 logits/softmax.

    q,k,v: [B, H, N, D]; bias: broadcastable to [B, H, N, N]; mask: True=keep.
    """
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    attn = attn * scale
    if bias is not None:
        attn = attn + bias.astype(jnp.float32)
    if mask is not None:
        attn = jnp.where(mask, attn, jnp.float32(-1e9))
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    b, h, n, d = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, n, h * d).astype(out_dtype)


class Attention(nn.Module):
    """Global multi-head self-attention with fused QKV (model_v1/model/HTR_VT.py:11-39)."""

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    quant: bool = False
    attn_impl: str = "auto"
    # Learned relative position bias over the full sequence, a (2L-1, H)
    # table indexed by token distance — the reference's GLOBAL blocks in
    # model_window carry one too (model_window/model/HTR_VT.py:23-31,44-47:
    # every Attention owns a table sized by num_patches, and the non-window
    # blocks apply it over the whole sequence). 0 = off (model_v1 behavior).
    rel_bias_len: int = 0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        from htr_vt_tpu.models.layers import QDense
        b, n, c = x.shape
        head_dim = c // self.num_heads
        qkv = QDense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                     quant=self.quant, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        bias = None
        if self.rel_bias_len:
            if n > self.rel_bias_len:
                raise ValueError(f"sequence length {n} exceeds rel_bias_len "
                                 f"{self.rel_bias_len}")
            table = self.param("rel_bias",
                               nn.initializers.zeros,
                               (2 * self.rel_bias_len - 1, self.num_heads))
            # reference convention: index [i, j] = (j - i) + L - 1
            # (model_window/model/HTR_VT.py:28-31)
            rel = (jnp.arange(n)[None, :] - jnp.arange(n)[:, None]
                   + self.rel_bias_len - 1)
            bias = table[rel].transpose(2, 0, 1)[None]  # [1, H, n, n]
        impl = resolve_attn_impl(self.attn_impl, n, head_dim,
                                 fused=(self.attn_drop > 0
                                        and not deterministic)
                                 or bias is not None)
        mha = flash_mha if impl == "flash" else multi_head_attention
        kw = {} if bias is None else {"bias": bias}
        out = mha(
            _split_heads(q, self.num_heads), _split_heads(k, self.num_heads),
            _split_heads(v, self.num_heads), scale=head_dim**-0.5,
            out_dtype=self.dtype, **kw)
        out = QDense(c, dtype=self.dtype, quant=self.quant, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class WindowAttention1D(nn.Module):
    """1-D windowed attention with learned relative position bias.

    Swin-style over the token sequence: partition N tokens into windows of
    ``window_size``; odd-indexed blocks cyclically shift by window_size//2
    (model_window/model/HTR_VT.py:114-154, bias table :23-31,:44-47). When N
    is not a multiple of the window (e.g. an --img-size whose width isn't a
    multiple of 64 tokens), the sequence is right-padded to a multiple and
    padded keys are masked out, matching the reference's key-padding-mask
    handling of arbitrary N (model_window/model/HTR_VT.py:266-278); padding
    is a static no-op for the standard 128-token grid.
    """

    num_heads: int
    window_size: int = 16
    shift: bool = False
    qkv_bias: bool = True
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    # Reference-faithful shifted windows allow wrap-around pairs: after the
    # cyclic roll the last window freely mixes sequence head and tail — the
    # reference masks only PAD keys, never cross-boundary pairs
    # (model_window/model/HTR_VT.py:133-154). False adds the Swin-style
    # segment mask that keeps attention strictly local (a documented
    # improvement over the reference, off by default for checkpoint parity).
    wrap_shift: bool = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, n, c = x.shape
        w = self.window_size
        head_dim = c // self.num_heads
        shift = w // 2 if self.shift else 0

        n_pad = -(-n // w) * w
        pad = n_pad - n
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        valid = jnp.arange(n_pad) < n  # key-padding mask (True = real token)

        # Learned relative position bias over [-w+1, w-1].
        table = self.param("rel_bias", nn.initializers.truncated_normal(0.02),
                           (2 * w - 1, self.num_heads))
        # reference convention: index [i, j] = (j - i) + w - 1
        rel = jnp.arange(w)[None, :] - jnp.arange(w)[:, None] + (w - 1)
        bias = table[rel]  # [w, w, H]
        bias = bias.transpose(2, 0, 1)[None]  # [1, H, w, w]

        if shift:
            x = jnp.roll(x, -shift, axis=1)
            valid = jnp.roll(valid, -shift)

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=_XAVIER, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def windows(t):  # [B, Np, C] -> [B * Np/w, H, w, hd]
            t = t.reshape(b * n_pad // w, w, c)
            return t.reshape(-1, w, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        mask = None
        if shift and not self.wrap_shift:
            # After a cyclic roll the last window mixes sequence head and tail;
            # Swin masks cross-boundary pairs so attention stays local.
            win_id = jnp.arange(n_pad) // w
            last = win_id == (n_pad // w - 1)
            orig_seg = (jnp.arange(n_pad) + shift) % n_pad >= (n_pad - shift)
            seg = jnp.where(last, orig_seg.astype(jnp.int32), 0)
            seg = seg.reshape(n_pad // w, w)
            pair_ok = seg[:, :, None] == seg[:, None, :]  # [Np/w, w, w]
            mask = pair_ok
        if pad:
            key_ok = valid.reshape(n_pad // w, w)[:, None, :]  # [Np/w, 1, w]
            mask = key_ok if mask is None else (mask & key_ok)
        if mask is not None:
            mask = jnp.tile(mask[:, None], (b, 1, 1, 1))  # [B*Np/w, 1, w, w]

        out = multi_head_attention(windows(q), windows(k), windows(v),
                                   scale=head_dim**-0.5, bias=bias, mask=mask,
                                   out_dtype=self.dtype)
        out = out.reshape(b, n_pad, c)
        if shift:
            out = jnp.roll(out, shift, axis=1)
        out = out[:, :n]
        out = nn.Dense(c, dtype=self.dtype, kernel_init=_XAVIER, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class Block(nn.Module):
    """Pre-norm transformer block (model_v1/model/HTR_VT.py:51-83).

    attention: "global" | "window" | "window_shifted".
    """

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    init_values: Optional[float] = None
    layer_norm_eps: float = 1e-6
    attention: str = "global"
    window_size: int = 16
    dtype: jnp.dtype = jnp.bfloat16
    quant: bool = False
    quick_gelu: bool = False
    attn_impl: str = "auto"
    rel_bias_len: int = 0  # global-attention rel-pos bias (Attention)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        dim = x.shape[-1]
        norm = lambda name: nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=jnp.float32,
                                         name=name)
        if self.attention == "global":
            attn = Attention(self.num_heads, self.qkv_bias, self.attn_drop, self.drop,
                             dtype=self.dtype, quant=self.quant,
                             attn_impl=self.attn_impl,
                             rel_bias_len=self.rel_bias_len, name="attn")
        elif self.attention in ("window", "window_shifted"):
            attn = WindowAttention1D(self.num_heads, self.window_size,
                                     shift=self.attention == "window_shifted",
                                     qkv_bias=self.qkv_bias, proj_drop=self.drop,
                                     dtype=self.dtype, name="attn")
        else:
            raise ValueError(f"unknown attention kind {self.attention!r}")

        ls1 = LayerScale(self.init_values, name="ls1") if self.init_values else (lambda y: y)
        ls2 = LayerScale(self.init_values, name="ls2") if self.init_values else (lambda y: y)
        dp1 = DropPath(self.drop_path, name="drop_path1")
        dp2 = DropPath(self.drop_path, name="drop_path2")

        # On the int8 serving path, barrier each residual so the NEXT norm's
        # stats reduce materializes as its own cheap pass instead of fusing
        # into the int8 matmul epilogue (measurement knob, round 5).
        import os
        bar = (jax.lax.optimization_barrier
               if self.quant and os.environ.get("HTRVT_VIT_BARRIER") == "1"
               else (lambda t: t))
        y = attn(norm("norm1")(x).astype(self.dtype), deterministic=deterministic)
        x = bar(x + dp1(ls1(y), deterministic=deterministic))
        y = Mlp(int(dim * self.mlp_ratio), drop_rate=self.drop, dtype=self.dtype,
                quant=self.quant, quick_gelu=self.quick_gelu,
                name="mlp")(norm("norm2")(x).astype(self.dtype), deterministic=deterministic)
        x = bar(x + dp2(ls2(y), deterministic=deterministic))
        return x
