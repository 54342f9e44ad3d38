"""Operator-level parity with torch: the semantics that decide CER parity.

These tests copy OUR parameters into hand-built torch layers and compare
activations, proving that conv padding/striding, MaxPool2d(3, (2,1), 1),
BatchNorm (eps/momentum/running stats), LayerNorm and the attention math
behave exactly like the torch operators the reference model is made of.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from htr_vt_tpu.models.layers import global_layer_norm, sincos_pos_embed_2d
from htr_vt_tpu.models.stem import BasicBlock, ResNet18Stem
from htr_vt_tpu.models.vit import Attention

ATOL = 2e-5


def test_conv_stride_padding_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 32, 3)).astype(np.float32)  # NHWC
    w = rng.standard_normal((3, 3, 3, 5)).astype(np.float32)    # HWIO
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), window_strides=(2, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    tout = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                    torch.from_numpy(w).permute(3, 2, 0, 1),
                    stride=(2, 1), padding=1)
    np.testing.assert_allclose(np.asarray(out),
                               tout.permute(0, 2, 3, 1).numpy(), atol=ATOL)


def test_maxpool_matches_torch():
    from flax import linen as nn
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 17, 33, 4)).astype(np.float32)
    out = nn.max_pool(jnp.asarray(x), window_shape=(3, 3), strides=(2, 1),
                      padding=((1, 1), (1, 1)))
    tout = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                        kernel_size=3, stride=(2, 1), padding=1)
    np.testing.assert_allclose(np.asarray(out),
                               tout.permute(0, 2, 3, 1).numpy(), atol=ATOL)


def test_batchnorm_train_and_running_stats_match_torch():
    from flax import linen as nn
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 8, 8, 6)).astype(np.float32)
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                      dtype=jnp.float32)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y, mutated = bn.apply(variables, jnp.asarray(x), mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm2d(6, eps=1e-5, momentum=0.1)
    tbn.train()
    ty = tbn(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(y),
                               ty.detach().permute(0, 2, 3, 1).numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), atol=1e-5)
    # torch tracks unbiased running var; flax tracks biased. The correction is
    # n/(n-1) on the batch-var contribution (momentum 0.1).
    n = x.shape[0] * x.shape[1] * x.shape[2]
    batch_var = x.reshape(-1, 6).var(axis=0)
    flax_var = np.asarray(mutated["batch_stats"]["var"])
    expected_torch = 0.9 * 1.0 + 0.1 * batch_var * n / (n - 1)
    np.testing.assert_allclose(tbn.running_var.numpy(), expected_torch, atol=1e-5)
    np.testing.assert_allclose(flax_var, 0.9 * 1.0 + 0.1 * batch_var, atol=1e-5)


def test_basic_block_matches_torch_composition():
    """Our BasicBlock == torch conv/bn/relu composition with shared weights."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8, 16, 4)).astype(np.float32)
    block = BasicBlock(features=6, strides=(2, 1), use_projection=True,
                       dtype=jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    y = block.apply(variables, jnp.asarray(x), train=False)

    p = variables["params"]
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)

    def tconv(name, inp, stride, k):
        w = torch.from_numpy(np.asarray(p[name]["kernel"])).permute(3, 2, 0, 1)
        return F.conv2d(inp, w, stride=stride, padding=k // 2)

    def tbn(name, inp):
        s = variables["batch_stats"][name]
        return F.batch_norm(inp, torch.from_numpy(np.asarray(s["mean"])),
                            torch.from_numpy(np.asarray(s["var"])),
                            torch.from_numpy(np.asarray(p[name]["scale"])),
                            torch.from_numpy(np.asarray(p[name]["bias"])),
                            training=False, eps=1e-5)

    h = torch.relu(tbn("bn1", tconv("conv1", tx, (2, 1), 3)))
    h = tbn("bn2", tconv("conv2", h, 1, 3))
    res = tbn("proj_bn", tconv("proj_conv", tx, (2, 1), 1))
    ty = torch.relu(h + res)
    np.testing.assert_allclose(np.asarray(y), ty.permute(0, 2, 3, 1).numpy(),
                               atol=1e-4)


def test_attention_matches_torch_manual():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 10, 16)).astype(np.float32)
    attn = Attention(num_heads=4, qkv_bias=True, dtype=jnp.float32)
    variables = attn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = attn.apply(variables, jnp.asarray(x))

    p = variables["params"]
    tx = torch.from_numpy(x)
    qkv_w = torch.from_numpy(np.asarray(p["qkv"]["kernel"]))  # [D, 3D]
    qkv_b = torch.from_numpy(np.asarray(p["qkv"]["bias"]))
    proj_w = torch.from_numpy(np.asarray(p["proj"]["kernel"]))
    proj_b = torch.from_numpy(np.asarray(p["proj"]["bias"]))

    qkv = tx @ qkv_w + qkv_b
    q, k, v = qkv.chunk(3, dim=-1)

    def heads(t):
        return t.reshape(2, 10, 4, 4).permute(0, 2, 1, 3)

    a = torch.softmax(heads(q) @ heads(k).transpose(-2, -1) * (4 ** -0.5), dim=-1)
    out = (a @ heads(v)).permute(0, 2, 1, 3).reshape(2, 10, 16)
    ty = out @ proj_w + proj_b
    np.testing.assert_allclose(np.asarray(y), ty.numpy(), atol=1e-5)


def test_global_layer_norm_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 6, 7, 1)).astype(np.float32)
    y = global_layer_norm(jnp.asarray(x))
    ty = F.layer_norm(torch.from_numpy(x), x.shape[1:], eps=1e-5)
    np.testing.assert_allclose(np.asarray(y), ty.numpy(), atol=ATOL)


def test_sincos_matches_reference_formula():
    """Independent numpy re-derivation of the reference construction."""
    dim, gh, gw = 16, 4, 2
    got = sincos_pos_embed_2d(dim, (gh, gw))
    grid = np.stack(np.meshgrid(np.arange(gw, dtype=np.float32),
                                np.arange(gh, dtype=np.float32)), 0)
    omega = 1.0 / 10000 ** (np.arange(dim // 4) / (dim / 4))
    out_a = np.einsum("m,d->md", grid[0].reshape(-1), omega)
    out_b = np.einsum("m,d->md", grid[1].reshape(-1), omega)
    want = np.concatenate([np.sin(out_a), np.cos(out_a),
                           np.sin(out_b), np.cos(out_b)], axis=1)
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-6)
    assert got.shape == (gh * gw, dim)


def test_stem_output_shape_flagship():
    stem = ResNet18Stem(embed_dim=768, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 512, 1))
    variables = stem.init(jax.random.PRNGKey(0), x, train=False)
    y = stem.apply(variables, x, train=False)
    assert y.shape == (1, 1, 128, 768)  # the reference's [B,768,1,128] in NHWC