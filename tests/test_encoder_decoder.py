"""Encoder-decoder model family: tokenizer, loss, generation."""

import jax
import jax.numpy as jnp
import numpy as np

from htr_vt_tpu.config import MaskConfig, ModelConfig
from htr_vt_tpu.models.encoder_decoder import (HTREncoderDecoder, generate,
                                               teacher_forcing_loss)
from htr_vt_tpu.text.converter import CTCLabelConverter
from htr_vt_tpu.text.ed_tokenizer import EDTokenizer


def test_tokenizer_teacher_forcing_pairs():
    tok = EDTokenizer(list("abc"))
    assert (tok.pad_id, tok.sos_id, tok.eos_id, tok.unk_id) == (0, 1, 2, 3)
    tin, tout, lens = tok.encode_for_training(["ab", "c"], max_length=5)
    a, b, c = tok.char_to_idx["a"], tok.char_to_idx["b"], tok.char_to_idx["c"]
    assert tin[0].tolist() == [1, a, b, 0, 0]       # <sos> a b
    assert tout[0].tolist() == [a, b, 2, 0, 0]      # a b <eos>
    assert lens.tolist() == [3, 2]
    # unknown chars -> <unk>
    tin2, _, _ = tok.encode_for_training(["xz"], max_length=4)
    assert tin2[0, 1] == tok.unk_id


def test_tokenizer_decode_stops_at_eos():
    tok = EDTokenizer(list("abc"))
    a = tok.char_to_idx["a"]
    ids = np.array([[a, a, 2, a], [0, a, 0, 0]])
    assert tok.decode(ids) == ["aa", "a"]


def test_tokenizer_from_ctc_converter():
    conv = CTCLabelConverter(list("xyz"))
    tok = EDTokenizer.from_ctc_converter(conv)
    assert tok.vocab_size == 3 + 4
    assert "x" in tok.char_to_idx


def test_teacher_forcing_loss_masks_pad():
    logits = jnp.zeros((1, 3, 5))
    tgt = jnp.array([[2, 0, 0]])  # only one real token
    loss = teacher_forcing_loss(logits, tgt, label_smoothing=0.0)
    # uniform logits -> loss = log(5) on the single valid position
    assert abs(float(loss) - np.log(5)) < 1e-5


def _tiny_ed():
    cfg = ModelConfig(nb_cls=8, img_size=(64, 128), embed_dim=64, depth=1,
                      num_heads=2, compute_dtype="float32",
                      masking=MaskConfig(mode="span", ratio=0.2, max_span_length=2))
    model = HTREncoderDecoder(cfg, vocab_size=10, decoder_layers=1,
                              decoder_heads=2, max_seq_len=16)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((2, 64, 128, 1))
    tgt = jnp.zeros((2, 8), jnp.int32)
    variables = model.init({"params": rng, "mask": rng, "dropout": rng}, img, tgt)
    return model, variables, img


def test_ed_forward_and_grad():
    model, variables, img = _tiny_ed()
    tgt_in = jnp.ones((2, 8), jnp.int32)
    logits = model.apply(variables, img, tgt_in, train=False)
    assert logits.shape == (2, 8, 10)

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            img, tgt_in, train=True, use_masking=True,
            rngs={"mask": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        return teacher_forcing_loss(out, tgt_in)

    g = jax.grad(loss)(variables["params"])
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g))


def test_generation_methods():
    model, variables, img = _tiny_ed()
    for method in ["greedy", "nucleus"]:
        ids = generate(model, variables, img, method=method, max_len=6,
                       rng=jax.random.PRNGKey(0))
        assert ids.shape == (2, 6)
        assert ids.dtype == jnp.int32
    ids = generate(model, variables, img, method="beam_search", max_len=6,
                   beam_size=3)
    assert ids.shape == (2, 6)


def test_causal_decoder_is_causal():
    """Changing a later target token must not affect earlier logits."""
    model, variables, img = _tiny_ed()
    t1 = jnp.array([[1, 4, 5, 6, 0, 0, 0, 0]], jnp.int32)
    t2 = t1.at[0, 5].set(7)
    l1 = model.apply(variables, jnp.zeros((1, 64, 128, 1)), t1, train=False)
    l2 = model.apply(variables, jnp.zeros((1, 64, 128, 1)), t2, train=False)
    np.testing.assert_allclose(np.asarray(l1[:, :5]), np.asarray(l2[:, :5]),
                               atol=1e-6)
    assert not np.allclose(np.asarray(l1[:, 5]), np.asarray(l2[:, 5]))


def test_cached_generation_matches_uncached():
    """The KV-cached greedy decode must equal full-prefix re-decoding."""
    model, variables, img = _tiny_ed()
    img = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 128, 1))
    max_len = 6

    cached = generate(model, variables, img, method="greedy", max_len=max_len,
                      repetition_penalty=1.0)

    # uncached reference: re-decode the whole prefix each step
    memory = model.apply(variables, img, method=model.encode)
    tokens = np.zeros((2, max_len + 1), np.int32)
    tokens[:, 0] = 1  # sos
    finished = np.zeros(2, bool)
    for t in range(max_len):
        logits = model.apply(variables, memory, jnp.asarray(tokens[:, :-1]),
                             method=model.decode_logits)
        nxt = np.argmax(np.asarray(logits[:, t]), axis=-1)
        nxt = np.where(finished, 0, nxt)
        tokens[:, t + 1] = nxt
        finished |= nxt == 2
    np.testing.assert_array_equal(np.asarray(cached), tokens[:, 1:])


def test_cached_beam_matches_uncached_beam():
    """KV-cached beam search must equal the full-prefix-re-decode beam (the
    round-1 implementation) on fixed inputs."""
    model, variables, img = _tiny_ed()
    img = jax.random.normal(jax.random.PRNGKey(9), (2, 64, 128, 1))
    max_len, k = 6, 3

    cached = np.asarray(generate(model, variables, img, method="beam_search",
                                 max_len=max_len, beam_size=k))

    # uncached reference beam: decode_logits over the whole prefix each step
    memory = model.apply(variables, img, method=model.encode)
    b = 2
    mem = jnp.repeat(memory, k, axis=0)
    tokens = np.zeros((b * k, max_len + 1), np.int32)
    tokens[:, 0] = 1  # sos
    scores = np.tile([0.0] + [-1e9] * (k - 1), b)
    finished = np.zeros(b * k, bool)
    for t in range(max_len):
        logits = model.apply(variables, mem, jnp.asarray(tokens[:, :-1]),
                             method=model.decode_logits)
        logp = np.asarray(jax.nn.log_softmax(
            logits[jnp.arange(b * k), t].astype(jnp.float32), axis=-1))
        pad_only = np.full(logp.shape[-1], -1e9)
        pad_only[0] = 0.0
        logp = np.where(finished[:, None], pad_only[None], logp)
        cand = (scores[:, None] + logp).reshape(b, -1)
        v = logp.shape[-1]
        top_idx = np.argsort(-cand, axis=1)[:, :k]
        top_scores = np.take_along_axis(cand, top_idx, axis=1)
        beam_idx = (top_idx // v + np.arange(b)[:, None] * k).reshape(-1)
        tok_idx = (top_idx % v).reshape(-1).astype(np.int32)
        tokens = tokens[beam_idx]
        tokens[:, t + 1] = tok_idx
        finished = finished[beam_idx] | (tok_idx == 2)
        scores = top_scores.reshape(-1)
    best = np.argmax(scores.reshape(b, k), axis=1) + np.arange(b) * k
    np.testing.assert_array_equal(cached, tokens[best, 1:])
