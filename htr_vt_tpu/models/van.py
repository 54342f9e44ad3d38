"""VAN (Visual Attention Network) height-reducing stem.

Re-design of the model_sgm_mms_attach_van(_2) front-end
(model_sgm_mms_attach_van/model/HTR_VT.py:159-256, forward :405-460):
a truncated ResNet leaves a [B, 4, W', C'] map; a 1x1 projection lifts it to
the transformer width; VAN blocks (1x1 -> GELU -> Large-Kernel-Attention
gate -> 1x1 -> BN, residual) mix it; adaptive average pooling collapses the
height; a depthwise 1xk HorizontalMixer smooths along width; the result is a
1-D token sequence with a (1, N) sin-cos positional embedding.

van  (model_sgm_mms_attach_van):   resnet stages [(D/4,(2,2)), (D/2,(2,2))],
                                   no final pool -> [B,4,128,D/2], N=128.
van2 (model_sgm_mms_attach_van_2): stages [(D/4,(2,1)), (D/2,(2,2)),
                                   (D,(1,2))] -> [B,4,64,D], N=64
                                   (model/resnet18.py:55-57,84 diff).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from htr_vt_tpu.models.layers import DropPath
from htr_vt_tpu.models.stem import ResNet18Stem

_CONV_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class LargeKernelAttention(nn.Module):
    """Depthwise 5x5 -> dilated depthwise 7x7 (d=3) -> 1x1 -> BN, multiplied
    as a gate (reference :159-180)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        d = x.shape[-1]
        a = nn.Conv(d, (5, 5), padding=((2, 2), (2, 2)), feature_group_count=d,
                    use_bias=False, dtype=self.dtype, kernel_init=_CONV_INIT,
                    name="dw")(x)
        a = nn.Conv(d, (7, 7), padding=((9, 9), (9, 9)), kernel_dilation=(3, 3),
                    feature_group_count=d, use_bias=False, dtype=self.dtype,
                    kernel_init=_CONV_INIT, name="dwd")(a)
        a = nn.Conv(d, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=_CONV_INIT, name="pw")(a)
        a = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(a).astype(x.dtype)
        return x * a


class VANBlock(nn.Module):
    """1x1 -> GELU -> LKA -> 1x1 -> BN + residual (reference :183-205)."""

    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        d = x.shape[-1]
        y = nn.Conv(d, (1, 1), dtype=self.dtype, name="proj1")(x)
        y = nn.gelu(y, approximate=False)
        y = LargeKernelAttention(dtype=self.dtype, name="lka")(y, train=train)
        y = nn.Conv(d, (1, 1), dtype=self.dtype, name="proj2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="norm")(y).astype(x.dtype)
        y = DropPath(self.drop_path, name="dp")(y, deterministic=not train)
        return x + y


class HorizontalMixer(nn.Module):
    """Depthwise 1xk along width + 1x1 fuse + BN, residual then GELU
    (reference :231-256)."""

    kernel: int = 9
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        d = x.shape[-1]
        k = self.kernel
        y = nn.Conv(d, (1, k), padding=((0, 0), (k // 2, k // 2)),
                    feature_group_count=d, use_bias=False, dtype=self.dtype,
                    kernel_init=_CONV_INIT, name="dw")(x)
        y = nn.Conv(d, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=_CONV_INIT, name="pw")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(y).astype(x.dtype)
        return nn.gelu(x + y, approximate=False)


class VanStem(nn.Module):
    """Truncated ResNet -> 1x1 proj -> VAN blocks -> height avg-pool ->
    HorizontalMixer. Returns [B, 1, W', embed_dim] like the baseline stem."""

    embed_dim: int = 768
    variant: str = "van"  # van | van2
    van_depth: int = 2
    hmix_kernel: int = 9
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        d = self.embed_dim
        if self.variant == "van":
            widths, strides = [d // 4, d // 2], [(2, 2), (2, 2)]
        elif self.variant == "van2":
            widths, strides = [d // 4, d // 2, d], [(2, 1), (2, 2), (1, 2)]
        else:
            raise ValueError(f"unknown VAN variant {self.variant!r}")
        x = ResNet18Stem(embed_dim=d, dtype=self.dtype, widths=widths,
                         stage_strides=strides, final_maxpool=False,
                         name="resnet")(x, train=train)
        if x.shape[-1] != d:
            x = nn.Conv(d, (1, 1), use_bias=False, dtype=self.dtype,
                        kernel_init=_CONV_INIT, name="proj_in")(x)
        for i in range(self.van_depth):
            x = VANBlock(dtype=self.dtype, name=f"van{i}")(x, train=train)
        x = x.mean(axis=1, keepdims=True)  # adaptive avg pool H -> 1
        x = HorizontalMixer(kernel=self.hmix_kernel, dtype=self.dtype,
                            name="hmix")(x, train=train)
        return x
