"""CheckpointManager: save/restore round-trip, best copies, rolling cleanup."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from htr_vt_tpu.config import ExperimentConfig, MaskConfig, ModelConfig, OptimConfig
from htr_vt_tpu.models.htr_vt import HTRVT
from htr_vt_tpu.train.checkpoint import CheckpointManager
from htr_vt_tpu.train.state import create_train_state


def _state(cfg, seed=0):
    model = HTRVT(cfg.model)
    return create_train_state(cfg, model, jax.random.PRNGKey(seed),
                              np.zeros((2, 64, 128, 1), np.float32))


def _cfg():
    return ExperimentConfig(
        model=ModelConfig(nb_cls=8, img_size=(64, 128), embed_dim=64, depth=1,
                          num_heads=2, compute_dtype="float32"),
        optim=OptimConfig(total_iters=10))


def test_roundtrip_exact(tmp_path):
    cfg = _cfg()
    state = _state(cfg, seed=1)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    mgr = CheckpointManager(str(tmp_path), keep=2)
    mgr.save(state, cer=0.25, wer=0.5, best_cer=0.25, best_wer=0.5)

    template = _state(cfg, seed=2)  # different values, same structure
    restored, meta = mgr.restore(str(tmp_path), template)
    assert int(restored.step) == 7
    assert meta["cer"] == 0.25 and meta["step"] == 7
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # PRNG key restored exactly -> bit-reproducible continuation
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(state.rng)),
        np.asarray(jax.random.key_data(restored.rng)))


def test_restore_into_subtree_template(tmp_path):
    """An SGM-trained checkpoint carries training-only params (sgm_head);
    eval CLIs build templates WITHOUT them and must still restore (the
    partial-restore path in CheckpointManager.restore)."""
    import dataclasses

    from htr_vt_tpu.config import SGMConfig

    cfg = _cfg()
    sgm_cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, sgm=SGMConfig(enable=True, vocab_size=16)))
    model = HTRVT(sgm_cfg.model)
    sgm_sample = {"sgm_left": np.zeros((2, 4, 5), np.int32),
                  "sgm_right": np.zeros((2, 4, 5), np.int32),
                  "sgm_tgt": np.zeros((2, 4), np.int32),
                  "sgm_mask": np.ones((2, 4), np.float32)}
    state = create_train_state(sgm_cfg, model, jax.random.PRNGKey(0),
                               np.zeros((2, 64, 128, 1), np.float32),
                               sgm_sample=sgm_sample)
    assert "sgm_head" in state.params
    mgr = CheckpointManager(str(tmp_path), keep=2)
    mgr.save(state, cer=0.3, wer=0.6, best_cer=0.3, best_wer=0.6)

    template = _state(cfg, seed=3)  # no sgm_head in this tree
    restored, meta = mgr.restore(str(tmp_path), template)
    assert "sgm_head" not in restored.params
    key = lambda kv: str(kv[0])
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(restored.params),
                   key=key),
            sorted(((k, v) for k, v in
                    jax.tree_util.tree_leaves_with_path(state.params)
                    if "sgm_head" not in str(k)), key=key)):
        assert str(ka) == str(kb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_copies_and_cleanup(tmp_path):
    cfg = _cfg()
    state = _state(cfg)
    mgr = CheckpointManager(str(tmp_path), keep=2)
    for step, cer in [(1, 0.9), (2, 0.5), (3, 0.7), (4, 0.4)]:
        s = state.replace(step=jnp.asarray(step, jnp.int32))
        best = min(cer, *( [0.9, 0.5, 0.7, 0.4][: step] ))
        mgr.save(s, cer=cer, wer=cer, best_cer=best, best_wer=best)
    names = sorted(os.listdir(str(tmp_path)))
    rolling = [n for n in names if n.startswith("checkpoint_")]
    assert len(rolling) == 2  # keep=2
    assert "best_CER" in names and "best_WER" in names
    # best_CER should be the step-4 save (cer 0.4)
    _, meta = mgr.restore(os.path.join(str(tmp_path), "best_CER"), _state(cfg, 3))
    assert meta["cer"] == 0.4 and meta["step"] == 4


def test_restore_parses_filename_convention(tmp_path):
    cfg = _cfg()
    state = _state(cfg).replace(step=jnp.asarray(5, jnp.int32))
    mgr = CheckpointManager(str(tmp_path))
    path = mgr.save(state, cer=0.1234, wer=0.5678, best_cer=0.1234, best_wer=0.5678)
    assert os.path.basename(path) == "checkpoint_0.1234_0.5678_5"
    os.remove(os.path.join(path, "meta.json"))  # force filename fallback
    _, meta = mgr.restore(path, _state(cfg, 4))
    assert meta == {"cer": 0.1234, "wer": 0.5678, "step": 5}
