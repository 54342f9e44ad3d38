"""SGM head: context-window construction and loss."""

import jax
import jax.numpy as jnp
import numpy as np

from htr_vt_tpu.models.sgm import SGMHead, SGMVocab, make_context_arrays
from htr_vt_tpu.text.converter import CTCLabelConverter


def _naive_windows(text, vocab, max_len, s):
    """Straightforward per-position reference implementation (the semantics of
    the reference's double loop)."""
    ids = [vocab.stoi[ch] for ch in text[:max_len]]
    L = len(ids)
    left = np.full((max_len, s), vocab.pad, np.int32)
    right = np.full((max_len, s), vocab.pad, np.int32)
    for i in range(L):
        lctx = ids[max(0, i - s):i]
        lctx = [vocab.bos_l] * (s - len(lctx)) + lctx
        left[i] = lctx[-s:]
        rctx = ids[i + 1:i + 1 + s]
        rctx = rctx + [vocab.eos] * (s - len(rctx))
        right[i] = rctx[:s]
    return left, right


def test_context_arrays_match_naive():
    conv = CTCLabelConverter(list("abcde "))
    vocab = SGMVocab(conv)
    texts = ["abcde", "a", "", "ed cba"]
    out = make_context_arrays(texts, vocab, max_len=8, sub_len=3)
    for b, t in enumerate(texts):
        left, right = _naive_windows(t, vocab, 8, 3)
        L = len(t)
        np.testing.assert_array_equal(out["sgm_left"][b, :L], left[:L], f"left {t!r}")
        np.testing.assert_array_equal(out["sgm_right"][b, :L], right[:L], f"right {t!r}")
        assert out["sgm_mask"][b].sum() == L


def test_sgm_head_loss_and_grads():
    conv = CTCLabelConverter(list("abcde "))
    vocab = SGMVocab(conv)
    texts = ["abc ab", "deadbe"]
    ctx = make_context_arrays(texts, vocab, max_len=8, sub_len=4)
    head = SGMHead(vocab_size=vocab.size, char_emb_dim=16, dtype=jnp.float32)
    vis = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 32))
    params = head.init(jax.random.PRNGKey(1), vis, ctx["sgm_left"],
                       ctx["sgm_right"], ctx["sgm_tgt"], ctx["sgm_mask"])

    def loss_fn(p, v):
        return head.apply(p, v, ctx["sgm_left"], ctx["sgm_right"],
                          ctx["sgm_tgt"], ctx["sgm_mask"])

    loss, grads = jax.value_and_grad(loss_fn)(params, vis)
    assert np.isfinite(float(loss)) and float(loss) > 0
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert gnorm > 0
    # Gradient also flows into the visual features (attach mode).
    gvis = jax.grad(lambda v: loss_fn(params, v))(vis)
    assert float(jnp.abs(gvis).max()) > 0


def test_sgm_integration_in_model():
    import dataclasses
    from htr_vt_tpu.config import ExperimentConfig, MaskConfig, ModelConfig, SGMConfig
    from htr_vt_tpu.models.htr_vt import HTRVT
    from htr_vt_tpu.train.state import create_train_state
    from htr_vt_tpu.train.step import jit_train_step

    conv = CTCLabelConverter(list("abcde "))
    vocab = SGMVocab(conv)
    cfg = ExperimentConfig(model=ModelConfig(
        nb_cls=conv.num_classes, img_size=(64, 128), embed_dim=64, depth=1,
        num_heads=2, compute_dtype="float32",
        masking=MaskConfig(mode="span", ratio=0.2, max_span_length=2),
        sgm=SGMConfig(enable=True, vocab_size=vocab.size, char_emb_dim=16)))
    model = HTRVT(cfg.model)
    B, Lmax = 4, 8
    texts = ["abc", "de ad", "cc", "abcde"]
    ctx = make_context_arrays(texts, vocab, Lmax, cfg.model.sgm.sub_len)
    labels, lengths = conv.encode_padded(texts, Lmax)
    batch = {"image": jnp.zeros((B, 64, 128, 1)),
             "labels": jnp.asarray(labels), "label_lengths": jnp.asarray(lengths),
             **{k: jnp.asarray(v) for k, v in ctx.items()}}
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               np.zeros((B, 64, 128, 1), np.float32),
                               sgm_sample=ctx)
    assert "sgm_head" in state.params
    fn = jit_train_step(model, cfg, donate=False)
    state2, metrics = fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_sgm"]) > 0
    # SGM params must be updated by the optimizer (same SAM group).
    before = jax.tree.leaves(state.params["sgm_head"])
    after = jax.tree.leaves(state2.params["sgm_head"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_sgm_detach_blocks_encoder_grad():
    """detach variant: SGM loss must not contribute encoder gradients
    (reference model_sgm_mms_detach/train.py:67)."""
    import dataclasses
    from htr_vt_tpu.config import ExperimentConfig, MaskConfig, ModelConfig, SGMConfig
    from htr_vt_tpu.models.htr_vt import HTRVT

    conv = CTCLabelConverter(list("ab"))
    vocab = SGMVocab(conv)
    base = ModelConfig(
        nb_cls=conv.num_classes, img_size=(64, 128), embed_dim=64, depth=1,
        num_heads=2, compute_dtype="float32",
        sgm=SGMConfig(enable=True, vocab_size=vocab.size, char_emb_dim=8,
                      detach_features=True, ctc_lambda=0.0, sgm_lambda=1.0))
    model = HTRVT(base)
    texts = ["ab", "ba"]
    ctx = {k: jnp.asarray(v) for k, v in
           make_context_arrays(texts, vocab, 4, base.sgm.sub_len).items()}
    img = jnp.zeros((2, 64, 128, 1))
    variables = model.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)}, img, sgm_batch=ctx)

    def sgm_only_loss(params):
        (_, sgm_loss), _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            img, train=True, use_masking=False, sgm_batch=ctx,
            rngs={"mask": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        return sgm_loss

    grads = jax.grad(sgm_only_loss)(variables["params"])
    stem_grad = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["stem"]))
    sgm_grad = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["sgm_head"]))
    assert stem_grad == 0.0
    assert sgm_grad > 0.0


def test_sgm_warmup_gates_loss():
    """--sgm-warmup-iters: SGM loss contributes 0 to the total before the
    threshold (reference model_sgm_2/train.py:37,139) and kicks in after."""
    from htr_vt_tpu.config import ExperimentConfig, ModelConfig, SGMConfig
    from htr_vt_tpu.models.htr_vt import HTRVT
    from htr_vt_tpu.train.step import make_loss_fn

    conv = CTCLabelConverter(list("ab"))
    vocab = SGMVocab(conv)
    cfg = ExperimentConfig(model=ModelConfig(
        nb_cls=conv.num_classes, img_size=(64, 128), embed_dim=64, depth=1,
        num_heads=2, compute_dtype="float32",
        sgm=SGMConfig(enable=True, vocab_size=vocab.size, char_emb_dim=8,
                      ctc_lambda=0.25, sgm_lambda=1.0, warmup_iters=10)))
    model = HTRVT(cfg.model)
    texts = ["ab", "ba"]
    ctx = make_context_arrays(texts, vocab, 4, cfg.model.sgm.sub_len)
    labels, lengths = conv.encode_padded(texts, 4)
    batch = {"image": jnp.zeros((2, 64, 128, 1)),
             "labels": jnp.asarray(labels), "label_lengths": jnp.asarray(lengths),
             **{k: jnp.asarray(v) for k, v in ctx.items()}}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "mask": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)},
                           batch["image"], sgm_batch=ctx)
    loss_fn = make_loss_fn(model, cfg)
    rng = jax.random.PRNGKey(7)

    def total(step):
        l, aux = loss_fn(variables["params"], variables.get("batch_stats", {}),
                         batch, rng, jnp.asarray(step, jnp.int32))
        return float(l), aux

    before, aux_b = total(0)
    at, aux_a = total(10)
    # Before warmup the total is exactly ctc_lambda * ctc; after, SGM is added.
    np.testing.assert_allclose(before, 0.25 * float(aux_b["loss_ctc"]), rtol=1e-6)
    np.testing.assert_allclose(
        at, 0.25 * float(aux_a["loss_ctc"]) + float(aux_a["loss_sgm"]), rtol=1e-6)
    assert at > before
