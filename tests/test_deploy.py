"""htr_vt_tpu/deploy.py: StableHLO serving bundles via jax.export.

Pins: (a) export -> serialize -> deserialize -> call is bit-exact vs the
live model, (b) the bundle decodes through meta.json's charset alone (no
model code), (c) multi-width bundles route by width, (d) version guard."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from htr_vt_tpu.config import ModelConfig
from htr_vt_tpu.deploy import (ServingBundle, export_serving, make_serving_fn,
                               save_bundle)
from htr_vt_tpu.models.htr_vt import HTRVT


def _tiny_model(width=128, nb_cls=6):
    cfg = ModelConfig(nb_cls=nb_cls, img_size=(64, width), embed_dim=64,
                      depth=1, num_heads=2, compute_dtype="float32")
    model = HTRVT(cfg=cfg)
    img = jnp.zeros((2, 64, width, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, img, train=False)
    return model, dict(variables)


def test_export_roundtrip_bit_exact(tmp_path):
    model, variables = _tiny_model()
    data = export_serving(model, variables, 2, (64, 128))
    save_bundle(str(tmp_path), {128: data}, {
        "charset": ["[blank]", "a", "b", "c", "d", "e"],
        "height": 64, "batch_size": 2, "quant": "float"})
    bundle = ServingBundle(str(tmp_path))

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 64, 128, 1)).astype(np.float32)
    ids, lengths = bundle.run(img)
    ref_ids, ref_len = jax.jit(make_serving_fn(model, variables))(img)
    np.testing.assert_array_equal(ids, np.asarray(ref_ids))
    np.testing.assert_array_equal(lengths, np.asarray(ref_len))

    texts = bundle.decode(ids, lengths)
    assert len(texts) == 2
    for t, n in zip(texts, lengths):
        assert len(t) == int(n)
        assert all(ch in "abcde" for ch in t)


def test_transcribe_pads_partial_batches(tmp_path):
    model, variables = _tiny_model()
    data = export_serving(model, variables, 2, (64, 128))
    save_bundle(str(tmp_path), {128: data}, {
        "charset": ["[blank]", "a", "b", "c", "d", "e"],
        "height": 64, "batch_size": 2, "quant": "float"})
    bundle = ServingBundle(str(tmp_path))
    rng = np.random.default_rng(1)
    img = rng.standard_normal((3, 64, 128, 1)).astype(np.float32)
    texts = bundle.transcribe(img)
    assert len(texts) == 3  # 2 full + 1 padded chunk, padding dropped
    # chunk boundaries must not change results
    t0 = bundle.transcribe(img[:2])
    assert texts[:2] == t0


def test_multi_width_bundle_routes_by_width(tmp_path):
    arts = {}
    models = {}
    for width in (128, 256):
        model, variables = _tiny_model(width)
        # same params across widths in a real bundle; fresh init is fine for
        # the routing check
        arts[width] = export_serving(model, variables, 2, (64, width))
        models[width] = (model, variables)
    save_bundle(str(tmp_path), arts, {
        "charset": ["[blank]", "a", "b", "c", "d", "e"],
        "height": 64, "batch_size": 2, "quant": "float"})
    bundle = ServingBundle(str(tmp_path))
    assert bundle.widths == [128, 256]
    rng = np.random.default_rng(2)
    for width in (128, 256):
        img = rng.standard_normal((2, 64, width, 1)).astype(np.float32)
        ids, lengths = bundle.run(img)
        model, variables = models[width]
        ref_ids, _ = jax.jit(make_serving_fn(model, variables))(img)
        np.testing.assert_array_equal(ids, np.asarray(ref_ids))
    with pytest.raises(KeyError):
        bundle.run(np.zeros((2, 64, 64, 1), np.float32))


def test_format_version_guard(tmp_path):
    model, variables = _tiny_model()
    data = export_serving(model, variables, 2, (64, 128))
    save_bundle(str(tmp_path), {128: data}, {
        "charset": ["[blank]"], "height": 64, "batch_size": 2})
    meta_path = os.path.join(str(tmp_path), "meta.json")
    meta = json.load(open(meta_path))
    meta["format_version"] = 999
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError):
        ServingBundle(str(tmp_path))
