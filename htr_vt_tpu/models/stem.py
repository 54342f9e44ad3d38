"""ResNet18 feature stem ("patch embedding").

TPU-native NHWC re-design of the reference stem (model_v1/model/resnet18.py):
a 1-channel conv stem plus three BasicBlock stages with anisotropic strides
that collapse a [B, 64, 512, 1] line image to [B, 1, 128, C] — one token per
4 px of width, height folded away. Stride plan (reference :48-54,:82):

    conv1 (2,1) -> maxpool3 (2,1) -> stage1 (2,1) -> stage2 (2,2)
    -> stage3 (2,2) -> maxpool3 (2,1)

BatchNorm runs in float32 with running averages; under jit over a
batch-sharded array the batch statistics are computed over the *global* batch
(XLA inserts the cross-replica reduction), which gives sync-BN semantics for
data parallelism without any hand-written collective.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

_CONV_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BasicBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    use_projection: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=1e-5, dtype=jnp.float32, name=name)
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, kernel_init=_CONV_INIT, name="conv1")(x)
        y = bn("bn1")(y).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, kernel_init=_CONV_INIT, name="conv2")(y)
        y = bn("bn2")(y).astype(self.dtype)
        if self.use_projection:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides, padding="VALID",
                               use_bias=False, dtype=self.dtype, kernel_init=_CONV_INIT,
                               name="proj_conv")(x)
            residual = bn("proj_bn")(residual).astype(self.dtype)
        return nn.relu(y + residual)


def _max_pool_3x3(x, strides: Tuple[int, int]):
    # torch MaxPool2d(kernel_size=3, stride, padding=1). XLA's native
    # select-and-scatter backward wins on TPU — the scatter-based custom VJP
    # in ops/pool.py is exact but 2x slower end-to-end (measured; see its
    # docstring), so the native op stays.
    return nn.max_pool(x, window_shape=(3, 3), strides=strides,
                       padding=((1, 1), (1, 1)))


class ResNet18Stem(nn.Module):
    """Maps [B, H, W, 1] -> [B, H', W', widths[-1]] (NHWC).

    Default plan reproduces the baseline stem ([B,64,512,1] -> [B,1,128,D]).
    The VAN variants truncate stages and change strides
    (model_sgm_mms_attach_van/model/resnet18.py:42-84 stops after layer2 with
    layer1 stride (2,2) and no final pool; the van_2 resnet adds a full-width
    layer3 with stride (1,2)) — expressed here as data.
    """

    embed_dim: int = 768
    dtype: jnp.dtype = jnp.bfloat16
    widths: Optional[Sequence[int]] = None  # default: [D/4, D/2, D]
    stage_strides: Sequence[Tuple[int, int]] = ((2, 1), (2, 2), (2, 2))
    final_maxpool: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = self.embed_dim // 4
        x = x.astype(self.dtype)
        x = nn.Conv(c, (3, 3), strides=(2, 1), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, kernel_init=_CONV_INIT, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn1")(x).astype(self.dtype)
        x = nn.relu(x)
        x = _max_pool_3x3(x, (2, 1))

        widths = list(self.widths) if self.widths is not None else \
            [self.embed_dim // 4, self.embed_dim // 2, self.embed_dim]
        in_width = c
        for si, (w, strides) in enumerate(zip(widths, self.stage_strides)):
            needs_proj = strides != (1, 1) or in_width != w
            x = BasicBlock(w, strides, use_projection=needs_proj, dtype=self.dtype,
                           name=f"stage{si + 1}_block1")(x, train=train)
            x = BasicBlock(w, (1, 1), use_projection=False, dtype=self.dtype,
                           name=f"stage{si + 1}_block2")(x, train=train)
            in_width = w

        if self.final_maxpool:
            x = _max_pool_3x3(x, (2, 1))
        return x
