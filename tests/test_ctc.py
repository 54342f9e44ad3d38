"""CTC loss parity vs torch.nn.CTCLoss (the reference criterion) and optax."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from htr_vt_tpu.ops.ctc import ctc_loss


def _torch_ctc(logits, labels_flat, label_lengths, logit_lengths):
    # Reference usage: permute to [T,B,C], log_softmax, CTCLoss(reduction='none',
    # zero_infinity=True) on flattened targets (model_v1/train.py:21-30).
    lp = torch.from_numpy(logits).permute(1, 0, 2).log_softmax(2)
    crit = torch.nn.CTCLoss(reduction="none", zero_infinity=True)
    return crit(lp, torch.from_numpy(labels_flat),
                torch.from_numpy(logit_lengths), torch.from_numpy(label_lengths)).numpy()


def _random_case(rng, b, t, c, lmin, lmax):
    logits = rng.standard_normal((b, t, c)).astype(np.float32) * 2.0
    lengths = rng.integers(lmin, lmax + 1, size=b).astype(np.int64)
    labels = np.zeros((b, lmax), np.int64)
    flat = []
    for i in range(b):
        li = rng.integers(1, c, size=lengths[i])
        labels[i, :lengths[i]] = li
        flat.extend(li.tolist())
    return logits, labels, np.asarray(flat, np.int64), lengths


def test_ctc_matches_torch_values():
    rng = np.random.default_rng(0)
    b, t, c, lmax = 6, 32, 11, 10
    logits, labels, flat, lengths = _random_case(rng, b, t, c, 2, lmax)
    logit_lengths = np.full((b,), t, np.int64)

    ref = _torch_ctc(logits, flat, lengths, logit_lengths)
    got = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                              jnp.asarray(lengths)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_ctc_matches_torch_gradients():
    rng = np.random.default_rng(1)
    b, t, c, lmax = 4, 24, 8, 7
    logits, labels, flat, lengths = _random_case(rng, b, t, c, 2, lmax)
    logit_lengths = np.full((b,), t, np.int64)

    th = torch.from_numpy(logits).requires_grad_(True)
    lp = th.permute(1, 0, 2).log_softmax(2)
    crit = torch.nn.CTCLoss(reduction="none", zero_infinity=True)
    loss = crit(lp, torch.from_numpy(flat), torch.from_numpy(logit_lengths),
                torch.from_numpy(lengths)).mean()
    loss.backward()
    ref_grad = th.grad.numpy()

    grad = jax.grad(lambda x: ctc_loss(x, jnp.asarray(labels),
                                       jnp.asarray(lengths)).mean())(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(grad), ref_grad, rtol=1e-3, atol=1e-5)


def test_ctc_zero_infinity():
    # Label longer than feasible for T frames -> torch zeroes loss and grad.
    b, t, c, lmax = 2, 5, 6, 12
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((b, t, c)).astype(np.float32)
    labels = np.zeros((b, lmax), np.int64)
    labels[0, :3] = [1, 2, 3]       # feasible
    labels[1, :] = ([1, 2] * 6)     # 12 labels in 5 frames: infeasible
    lengths = np.array([3, 12], np.int64)

    losses = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                                 jnp.asarray(lengths)))
    assert losses[1] == 0.0
    assert losses[0] > 0.0

    grad = jax.grad(lambda x: ctc_loss(x, jnp.asarray(labels),
                                       jnp.asarray(lengths)).sum())(jnp.asarray(logits))
    grad = np.asarray(grad)
    assert np.all(np.isfinite(grad))
    np.testing.assert_allclose(grad[1], 0.0, atol=1e-7)
    assert np.abs(grad[0]).max() > 0


def test_ctc_matches_optax():
    import optax
    rng = np.random.default_rng(3)
    b, t, c, lmax = 5, 20, 9, 8
    logits, labels, _, lengths = _random_case(rng, b, t, c, 1, lmax)
    got = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                              jnp.asarray(lengths)))
    label_pad = (np.arange(lmax)[None] >= lengths[:, None]).astype(np.float32)
    ref = np.asarray(optax.ctc_loss(jnp.asarray(logits),
                                    jnp.zeros((b, t), np.float32),
                                    jnp.asarray(labels), jnp.asarray(label_pad)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_ctc_variable_logit_lengths():
    rng = np.random.default_rng(4)
    b, t, c, lmax = 4, 30, 7, 6
    logits, labels, flat, lengths = _random_case(rng, b, t, c, 2, lmax)
    logit_lengths = np.array([30, 25, 18, 12], np.int64)
    ref = _torch_ctc(logits, flat, lengths, logit_lengths)
    got = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                              jnp.asarray(lengths), jnp.asarray(logit_lengths)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_ctc_empty_label_matches_torch():
    """Zero-length targets (blank-only alignment) are legal in the datasets."""
    rng = np.random.default_rng(9)
    logits = rng.standard_normal((2, 10, 5)).astype(np.float32)
    labels = np.zeros((2, 4), np.int64)
    labels[1, :2] = [1, 2]
    lengths = np.array([0, 2], np.int64)
    got = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                              jnp.asarray(lengths)))
    ref = _torch_ctc(logits, np.array([1, 2], np.int64), lengths,
                     np.full((2,), 10, np.int64))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    grad = jax.grad(lambda l: ctc_loss(l, jnp.asarray(labels),
                                       jnp.asarray(lengths)).sum())(jnp.asarray(logits))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_ctc_pallas_sharded_interpret_matches_scan():
    """Pallas CTC (interpret mode) jitted over batch-sharded inputs on the
    8-device CPU mesh must match the scan implementation — validates the
    custom_partitioning SPMD rule (no mesh side channel) without TPU
    hardware. The kernels shard over the batch axis purely from the
    operands' NamedSharding."""
    import jax.experimental.pallas as pl
    import htr_vt_tpu.ops.ctc_pallas as cp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from htr_vt_tpu.parallel.mesh import make_mesh

    orig = pl.pallas_call
    cp.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        rng = np.random.default_rng(11)
        b, t, c, lmax = 16, 20, 9, 6
        logits, labels, _, lengths = _random_case(rng, b, t, c, 2, lmax)
        mesh = make_mesh()
        sh = lambda *spec: NamedSharding(mesh, P(*spec))
        sl = jax.device_put(jnp.asarray(logits), sh("data", None, None))
        sy = jax.device_put(jnp.asarray(labels), sh("data", None))
        sn = jax.device_put(jnp.asarray(lengths), sh("data"))

        got = jax.jit(cp.ctc_loss_pallas)(sl, sy, sn)
        assert got.sharding.spec == P("data")  # stayed batch-sharded
        ref = ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                       jnp.asarray(lengths))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # gradients flow through the sharded path too
        g = jax.jit(jax.grad(lambda l: cp.ctc_loss_pallas(l, sy, sn).mean()))(sl)
        gref = jax.grad(lambda l: ctc_loss(l, jnp.asarray(labels),
                                           jnp.asarray(lengths)).mean())(
            jnp.asarray(logits))
        np.testing.assert_allclose(np.asarray(g), np.asarray(gref),
                                   rtol=1e-4, atol=1e-6)
    finally:
        cp.pl.pallas_call = orig


def test_ctc_pallas_time_paneling_past_the_64k_cliff():
    """Round-5 verdict #7: the 2048-px bucket shape (T=512, S=225; T*S=115k)
    overflowed the round-4 kernels' whole-cube VMEM residency and silently
    fell back to the scan. The kernels now panel the time axis over a
    sequential grid dim with the alpha/beta carry in scratch; this pins (a)
    the auto gate routes such shapes to Pallas, and (b) interpret-mode
    values/grads match the scan at a multi-panel shape."""
    import numpy as np

    from htr_vt_tpu.ops import ctc_pallas as cp
    from htr_vt_tpu.ops.ctc import ctc_loss

    assert cp.pallas_supported(512, 225)
    assert cp.pallas_supported(2048, 451)

    # force multi-panel even at a CPU-sized problem
    orig_budget = cp._VMEM_BUDGET
    orig_call = cp.pl.pallas_call
    cp._VMEM_BUDGET = 8 * 4 * 49 * 16  # fits tp=4 exactly -> 4-step panels
    cp.pl.pallas_call = lambda *a, **k: orig_call(*a, **{**k,
                                                         "interpret": True})
    try:
        assert cp._panel_len(16, 49, 8) == 4
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.standard_normal((8, 16, 12)), jnp.float32)
        labels = jnp.asarray(rng.integers(1, 12, (8, 5)), jnp.int32)
        lens = jnp.asarray(rng.integers(1, 6, (8,)), jnp.int32)
        lp = cp.ctc_loss_pallas(logits, labels, lens)
        ls = ctc_loss(logits, labels, lens)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(ls),
                                   rtol=1e-5, atol=1e-5)
        gp = jax.grad(lambda lg: jnp.sum(cp.ctc_loss_pallas(
            lg, labels, lens)))(logits)
        gs = jax.grad(lambda lg: jnp.sum(ctc_loss(lg, labels, lens)))(logits)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                                   rtol=1e-4, atol=1e-5)
    finally:
        cp._VMEM_BUDGET = orig_budget
        cp.pl.pallas_call = orig_call
