"""ops/quant.py: dynamic int8 conv/dot for quantized inference."""

import jax
import jax.numpy as jnp
import numpy as np

from htr_vt_tpu.ops.quant import conv_int8, dot_int8


def test_conv_int8_close_to_float():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 12)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 12, 24)) * 0.1, jnp.float32)
    y = conv_int8(x, w)
    yr = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    rel = float(jnp.max(jnp.abs(y - yr)) / jnp.max(jnp.abs(yr)))
    assert rel < 0.03, rel


def test_conv_int8_strided():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
    y = conv_int8(x, w, strides=(2, 2))
    assert y.shape == (2, 4, 8, 16)
    yr = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    rel = float(jnp.max(jnp.abs(y - yr)) / jnp.max(jnp.abs(yr)))
    assert rel < 0.03, rel


def test_dot_int8_close_to_float_and_batched():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 6, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 16)) * 0.1, jnp.float32)
    y = dot_int8(x, w)
    assert y.shape == (4, 6, 16)
    yr = x @ w
    rel = float(jnp.max(jnp.abs(y - yr)) / jnp.max(jnp.abs(yr)))
    assert rel < 0.03, rel


def test_int8_per_channel_scales_handle_mixed_magnitudes():
    """A per-tensor weight scale would crush small channels next to a huge
    one; per-output-channel scales keep each channel's relative error small."""
    rng = np.random.default_rng(3)
    w = rng.standard_normal((32, 4)).astype(np.float32) * 0.01
    w[:, 0] *= 1000.0  # one dominant channel
    x = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)
    y = dot_int8(x, jnp.asarray(w))
    yr = x @ jnp.asarray(w)
    for c in range(4):
        denom = float(jnp.max(jnp.abs(yr[:, c])))
        rel = float(jnp.max(jnp.abs(y[:, c] - yr[:, c]))) / denom
        assert rel < 0.05, (c, rel)


def test_int8_stem_policy():
    """int8 applies only where the MXU contraction tiles fully (measured:
    192-channel stage1 gains nothing) — mirror of the conv_impl policy."""
    from htr_vt_tpu.models.stem import _int8_pays
    assert not _int8_pays(192, 192)   # stage1
    assert not _int8_pays(192, 384)   # stage2 conv1 / proj
    assert _int8_pays(384, 384)       # stage2 conv2
    assert _int8_pays(384, 768) and _int8_pays(768, 768)  # stage3
    assert not _int8_pays(16, 64)     # tiny test models stay float


def test_int8_zero_input_safe():
    x = jnp.zeros((2, 4, 4, 8), jnp.float32)
    w = jnp.ones((3, 3, 8, 8), jnp.float32)
    y = conv_int8(x, w)
    assert np.isfinite(np.asarray(y)).all() and float(jnp.abs(y).max()) == 0.0


def test_quantized_flagship_eval_close_to_float():
    """ModelConfig.quant='int8' swaps the stem convs and ViT matmuls to the
    dynamic-int8 path at EVAL only: same parameter tree, logits within a few
    percent of the float model, and the training trace stays float."""
    import dataclasses

    from htr_vt_tpu.config import MaskConfig, ModelConfig
    from htr_vt_tpu.models.htr_vt import HTRVT

    rng = np.random.default_rng(5)
    base = ModelConfig(nb_cls=8, img_size=(64, 128), embed_dim=64, depth=2,
                       num_heads=2, compute_dtype="float32",
                       masking=MaskConfig(mode="none"))
    fmodel = HTRVT(base)
    # quant_gelu="exact" isolates the int8 error from the (separately
    # defaulted) quick-GELU approximation; the quick flavor is pinned below.
    qmodel = HTRVT(dataclasses.replace(base, quant="int8",
                                       quant_gelu="exact"))
    img = jnp.asarray(rng.random((2, 64, 128, 1)), jnp.float32)
    key = jax.random.PRNGKey(0)
    variables = fmodel.init({"params": key, "mask": key, "dropout": key},
                            img, train=False)
    yf = fmodel.apply(variables, img, train=False)
    yq = qmodel.apply(variables, img, train=False)  # same tree, quant path
    assert yq.shape == yf.shape
    rel = float(jnp.linalg.norm(yq - yf) / (jnp.linalg.norm(yf) + 1e-9))
    assert rel < 0.15, rel
    assert not np.allclose(np.asarray(yq), np.asarray(yf))  # int8 really ran

    # Training trace of the quant config is the float path: gradients exist
    # and match the float model's (round() has no useful gradient, so this
    # would fail loudly if quant leaked into training).
    def loss(m, v):
        out, _ = m.apply(v, img, train=True, use_masking=False,
                         rngs={"mask": key, "dropout": key},
                         mutable=["batch_stats"])
        return (out.astype(jnp.float32) ** 2).mean()

    gq = jax.grad(lambda p: loss(qmodel, {**variables, "params": p}))(
        variables["params"])
    gf = jax.grad(lambda p: loss(fmodel, {**variables, "params": p}))(
        variables["params"])
    for a, b in zip(jax.tree.leaves(gq), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # Calibrated static-scale path: one float pass records per-site amax
    # (and returns FLOAT outputs), then eval with quant_stats runs the fused
    # static path — at per-tensor granularity it should track the dynamic
    # path closely and the float model within a few percent.
    ycal, mut = qmodel.apply(variables, img, train=False,
                             mutable=["quant_stats"])
    np.testing.assert_allclose(np.asarray(ycal), np.asarray(yf),
                               rtol=2e-5, atol=2e-5)  # calibration IS float
    stats = mut["quant_stats"]
    assert all(float(v) > 0 for v in jax.tree.leaves(stats))
    ys = qmodel.apply({**variables, "quant_stats": stats}, img, train=False)
    rel_s = float(jnp.linalg.norm(ys - yf) / (jnp.linalg.norm(yf) + 1e-9))
    assert rel_s < 0.15, rel_s
    assert not np.allclose(np.asarray(ys), np.asarray(yf))

    # quick-GELU serving default (config.quant_gelu="quick"): a bounded extra
    # approximation on top of int8 — logits stay close to float, and its
    # calibration pass (float matmuls + quick GELU) tracks float closely too.
    qk = HTRVT(dataclasses.replace(base, quant="int8"))
    ycal_q, mut_q = qk.apply(variables, img, train=False,
                             mutable=["quant_stats"])
    rel_cal = float(jnp.linalg.norm(ycal_q - yf) /
                    (jnp.linalg.norm(yf) + 1e-9))
    assert rel_cal < 0.05, rel_cal
    yq2 = qk.apply({**variables, "quant_stats": mut_q["quant_stats"]},
                   img, train=False)
    rel_q = float(jnp.linalg.norm(yq2 - yf) / (jnp.linalg.norm(yf) + 1e-9))
    assert rel_q < 0.15, rel_q


def test_quantized_conformer_eval_close_to_float():
    """int8 serving covers the conformer family too (round-3): QKV/proj,
    macaron FFNs, and the ConvModule pointwise matmuls run int8 with the
    SAME parameter tree; depthwise convs stay float (bandwidth-bound)."""
    import dataclasses

    from htr_vt_tpu.config import MaskConfig, ModelConfig
    from htr_vt_tpu.models.htr_vt import HTRVT

    rng = np.random.default_rng(11)
    for encoder in ("conformer", "squeezeformer"):
        base = ModelConfig(nb_cls=8, img_size=(64, 128), embed_dim=64,
                           depth=2, num_heads=2, compute_dtype="float32",
                           encoder=encoder, masking=MaskConfig(mode="none"))
        fmodel = HTRVT(base)
        qmodel = HTRVT(dataclasses.replace(base, quant="int8",
                                           quant_gelu="exact"))
        img = jnp.asarray(rng.random((2, 64, 128, 1)), jnp.float32)
        key = jax.random.PRNGKey(0)
        variables = fmodel.init({"params": key, "mask": key, "dropout": key},
                                img, train=False)
        yf = fmodel.apply(variables, img, train=False)

        # dynamic int8: same tree, logits close to float but not identical
        yq = qmodel.apply(variables, img, train=False)
        rel = float(jnp.linalg.norm(yq - yf) / (jnp.linalg.norm(yf) + 1e-9))
        assert rel < 0.15, (encoder, rel)
        assert not np.allclose(np.asarray(yq), np.asarray(yf)), encoder

        # calibrate -> static path: calibration pass IS float; the static
        # eval runs int8 and stays close
        ycal, mut = qmodel.apply(variables, img, train=False,
                                 mutable=["quant_stats"])
        np.testing.assert_allclose(np.asarray(ycal), np.asarray(yf),
                                   rtol=2e-5, atol=2e-5)
        assert len(jax.tree.leaves(mut["quant_stats"])) > 0, encoder
        ys = qmodel.apply({**variables, "quant_stats": mut["quant_stats"]},
                          img, train=False)
        rel_s = float(jnp.linalg.norm(ys - yf) / (jnp.linalg.norm(yf) + 1e-9))
        assert rel_s < 0.15, (encoder, rel_s)


def test_calibrate_quant_stats_running_max():
    """The shared calibration helper (ops/quant.py:calibrate_quant_stats,
    used by cli/{test,export,serve}.py and bench tools) must take the
    RUNNING abs-max across batches — a single batch can under-estimate the
    scale and silently clip later activations (ADVICE r2) — and honor
    n_batches."""
    import dataclasses

    from htr_vt_tpu.config import MaskConfig, ModelConfig
    from htr_vt_tpu.models.htr_vt import HTRVT
    from htr_vt_tpu.ops.quant import calibrate_quant_stats

    rng = np.random.default_rng(7)
    cfg = ModelConfig(nb_cls=8, img_size=(64, 128), embed_dim=64, depth=1,
                      num_heads=2, compute_dtype="float32", quant="int8",
                      masking=MaskConfig(mode="none"))
    model = HTRVT(cfg)
    small = jnp.asarray(rng.random((2, 64, 128, 1)), jnp.float32) * 0.1
    big = small * 10.0
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "mask": key, "dropout": key},
                           small, train=False)
    base = {"params": variables["params"],
            "batch_stats": variables["batch_stats"]}

    s_small = calibrate_quant_stats(model, base, [small], 1)
    s_both = calibrate_quant_stats(model, base, [small, big], 2)
    s_rev = calibrate_quant_stats(model, base, [big, small], 2)
    leaves = lambda s: np.array([float(v) for v in jax.tree.leaves(s)])
    assert (leaves(s_both) >= leaves(s_small)).all()
    assert (leaves(s_both) > leaves(s_small)).any()  # big batch raised amax
    # order-independent: running max, not last-batch-wins
    np.testing.assert_allclose(leaves(s_both), leaves(s_rev), rtol=1e-6)
    # n_batches truncates the iterable
    s_trunc = calibrate_quant_stats(model, base, [small, big], 1)
    np.testing.assert_allclose(leaves(s_trunc), leaves(s_small), rtol=1e-6)


def test_stage1_pad_preserves_predictions():
    """quant_stage1_pad (round 5): pad_stage1_tree zero-pads a 192-ch
    flagship tree to the 256-wide serving model. In exact arithmetic the
    logits are unchanged (zero kernels/shifts/means, unit gammas/vars keep
    every padded channel at exactly 0 through the stage); in bf16 the
    different conv tilings reorder f32 accumulation, so the pin is
    prediction equality plus a logit-noise bound at the int8 noise floor.
    Also pins: idempotence, and that tiny models bypass the pad
    (_stage1_pad_applies)."""
    import dataclasses

    from htr_vt_tpu.config import MaskConfig, ModelConfig
    from htr_vt_tpu.models.htr_vt import HTRVT, _stage1_pad_applies
    from htr_vt_tpu.ops.quant import (calibrate_quant_stats, pad_stage1_tree,
                                      serving_arrays)

    # gate: flagship pads, tiny and already-aligned widths do not
    flag = ModelConfig(nb_cls=8, img_size=(64, 64), quant="int8")
    assert _stage1_pad_applies(flag)
    assert not _stage1_pad_applies(dataclasses.replace(flag, embed_dim=64))
    assert not _stage1_pad_applies(dataclasses.replace(flag, embed_dim=1024))
    assert not _stage1_pad_applies(dataclasses.replace(flag, quant="none"))

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)
    f_cfg = dataclasses.replace(flag, quant="none")
    fmodel = HTRVT(f_cfg)
    key = jax.random.PRNGKey(0)
    variables = fmodel.init({"params": key, "mask": key, "dropout": key},
                            img, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    pp, ps = serving_arrays(flag, params, stats)
    k = pp["stem"]["stage1_block1"]["conv1"]["kernel"]
    assert k.shape == (3, 3, 192, 256)
    assert np.abs(np.asarray(k)[..., 192:]).max() == 0.0
    assert ps["stem"]["stage1_block2"]["bn1"]["var"].shape == (256,)
    # idempotent on an already-padded tree
    pp2, ps2 = pad_stage1_tree(pp, ps, 256)
    np.testing.assert_array_equal(
        np.asarray(pp2["stem"]["stage1_block2"]["conv2"]["kernel"]),
        np.asarray(pp["stem"]["stage1_block2"]["conv2"]["kernel"]))

    yf = fmodel.apply({"params": params, "batch_stats": stats}, img,
                      train=False)
    qmodel = HTRVT(flag)
    qs = calibrate_quant_stats(qmodel, {"params": pp, "batch_stats": ps},
                               [img], 1)
    yq = qmodel.apply({"params": pp, "batch_stats": ps, "quant_stats": qs},
                      img, train=False)
    assert yq.shape == yf.shape
    af = np.argmax(np.asarray(yf, np.float32), -1)
    aq = np.argmax(np.asarray(yq, np.float32), -1)
    assert (af == aq).mean() == 1.0
    rel = float(jnp.linalg.norm(yq.astype(jnp.float32)
                                - yf.astype(jnp.float32))
                / (jnp.linalg.norm(yf.astype(jnp.float32)) + 1e-9))
    assert rel < 0.15, rel
