"""FULL-MODEL parity against the actual reference PyTorch module.

Operator-level parity (test_torch_parity.py) proves the pieces behave like
torch ops; this file closes the loop by instantiating the reference's
``model_v1/model/HTR_VT.py`` itself (read-only import from /root/reference),
converting its weights with utils/torch_convert.py, and asserting

  1. end-to-end forward logits match (eval mode, no masking), and
  2. a multi-step SAM + AdamW + EMA training trajectory matches, driving the
     torch side with the reference's own ``utils/sam.py`` optimizer.

The reference imports ``timm.models.vision_transformer.Mlp/DropPath``
(model_v1/model/HTR_VT.py:4); timm is absent in this environment, so a
minimal functional stand-in (the standard fc1-act-drop-fc2-drop Mlp and an
identity DropPath at p=0) is registered before import.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch
import torch.nn.functional as F

from htr_vt_tpu.config import (ExperimentConfig, MaskConfig, ModelConfig,
                               OptimConfig, TrainConfig)
from htr_vt_tpu.models.htr_vt import HTRVT
from htr_vt_tpu.optim.schedule import warmup_cosine_lr
from htr_vt_tpu.utils.torch_convert import reference_state_dict_to_tree

REF_DIR = "/root/reference/model_v1"


def _install_timm_stub():
    """Minimal timm.models.vision_transformer with the two symbols the
    reference uses. Mlp follows the timm contract the reference relies on
    (fc1 -> GELU -> dropout -> fc2 -> dropout); DropPath at drop_prob 0 is
    identity (the reference never sets drop_path > 0 in model_v1)."""
    if "timm.models.vision_transformer" in sys.modules:
        return

    class Mlp(torch.nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=torch.nn.GELU, drop=0.0, **kw):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = torch.nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.drop1 = torch.nn.Dropout(drop)
            self.fc2 = torch.nn.Linear(hidden_features, out_features)
            self.drop2 = torch.nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            mask = torch.bernoulli(
                torch.full((x.shape[0],) + (1,) * (x.ndim - 1), keep,
                           device=x.device))
            return x * mask / keep

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    vt.Mlp = Mlp
    vt.DropPath = DropPath
    models.vision_transformer = vt
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.vision_transformer"] = vt


@pytest.fixture(scope="module")
def ref_htr_vt():
    """Import the reference model module (model_v1/model/HTR_VT.py)."""
    _install_timm_stub()
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)  # makes 'model' a namespace package
    spec = importlib.util.spec_from_file_location(
        "model.HTR_VT", f"{REF_DIR}/model/HTR_VT.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_sam():
    spec = importlib.util.spec_from_file_location(
        "ref_sam", f"{REF_DIR}/utils/sam.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ours_cfg(nb_cls=20, img=(64, 128)):
    return ModelConfig(nb_cls=nb_cls, img_size=img, compute_dtype="float32",
                       masking=MaskConfig(mode="none"))


def _convert(tmodel):
    # .numpy() views torch memory and jnp.asarray can be zero-copy on CPU;
    # torch's SAM later mutates parameters IN-PLACE, so force real copies or
    # the "converted" tree would silently track the torch trajectory.
    sd = {k: np.array(v.detach().numpy(), copy=True)
          for k, v in tmodel.state_dict().items()}
    params, stats, unused = reference_state_dict_to_tree(sd)
    assert unused == [], f"converter left reference weights unused: {unused}"
    to_f32 = lambda t: jax.tree.map(
        lambda a: jnp.array(a, jnp.float32, copy=True), t)
    return to_f32(params), to_f32(stats)


def test_full_forward_logits_match_reference_module(ref_htr_vt):
    """Shared weights -> identical logits through the whole pipeline:
    input-LN, stem, tokens, +pos-embed, 4 blocks, norm, head, logit-LN
    (reference forward model_v1/model/HTR_VT.py:222-241)."""
    torch.manual_seed(0)
    # img_size as the reference CLI passes it: args.img_size[::-1] = [H, W]
    # (model_v1/train.py:58); grid = [W/4, H/64].
    tmodel = ref_htr_vt.create_model(nb_cls=80, img_size=[64, 128])
    tmodel.eval()

    params, stats = _convert(tmodel)
    ours = HTRVT(_ours_cfg(nb_cls=80, img=(64, 128)))

    rng = np.random.default_rng(0)
    x = rng.random((2, 64, 128, 1), dtype=np.float32)

    got = ours.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x), train=False)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=2e-4, rtol=1e-4)


def test_full_forward_logits_match_in_train_bn_mode(ref_htr_vt):
    """Same comparison with BatchNorm in train mode (batch statistics), the
    path the SAM step actually differentiates."""
    torch.manual_seed(1)
    tmodel = ref_htr_vt.create_model(nb_cls=20, img_size=[64, 128])
    tmodel.train()

    params, stats = _convert(tmodel)
    ours = HTRVT(_ours_cfg())

    rng = np.random.default_rng(1)
    x = rng.random((2, 64, 128, 1), dtype=np.float32)
    got, _ = ours.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), train=True, use_masking=False,
                        rngs={"dropout": jax.random.PRNGKey(0)},
                        mutable=["batch_stats"])
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_sam_adamw_ema_trajectory_matches_reference(ref_htr_vt, ref_sam):
    """Three full SAM iterations (2 fwd+bwd each) + EMA, torch side driven by
    the reference's own SAM optimizer (utils/sam.py) and training-loop order
    (model_v1/train.py:113-128), must land on the same parameters.

    Masking is disabled on both sides so the trajectory is deterministic
    (mask randomness differs by design — distributions match, streams don't).
    The mask_token gets a zero (not None) gradient on the torch side so
    AdamW's decoupled weight decay treats it like optax does.
    """
    torch.manual_seed(2)
    nb_cls, T = 20, 32  # grid [128/4, 64/64] = 32 tokens
    tmodel = ref_htr_vt.create_model(nb_cls=nb_cls, img_size=[64, 128])
    tmodel.train()

    params, stats = _convert(tmodel)

    optim = OptimConfig(max_lr=1e-3, warmup_iters=4, total_iters=16,
                        weight_decay=0.5, sam_rho=0.05, ema_decay=0.9999)
    cfg = ExperimentConfig(model=_ours_cfg(), optim=optim,
                           train=TrainConfig(tri_masked=False))

    rng = np.random.default_rng(2)
    bs = 2
    x = rng.random((bs, 64, 128, 1), dtype=np.float32)
    labels = rng.integers(1, nb_cls, (bs, 12)).astype(np.int32)
    lengths = np.array([12, 9], np.int32)

    # ---- torch side: the reference's literal step order -------------------
    tsam = ref_sam.SAM(tmodel.parameters(), torch.optim.AdamW, rho=0.05,
                       lr=1e-7, betas=(0.9, 0.99), weight_decay=0.5)
    criterion = torch.nn.CTCLoss(reduction="none", zero_infinity=True)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    ttargets = torch.from_numpy(
        np.concatenate([labels[i, :lengths[i]] for i in range(bs)]))
    tlens = torch.from_numpy(lengths).long()
    ema_sd = {k: v.detach().clone().float()
              for k, v in tmodel.state_dict().items()}

    def t_loss():
        preds = tmodel(tx)
        logp = preds.permute(1, 0, 2).log_softmax(2)
        in_lens = torch.full((bs,), T, dtype=torch.long)
        loss = criterion(logp, ttargets, in_lens, tlens).mean()
        # zero (not None) grad for the unused mask_token, see docstring
        return loss + 0.0 * tmodel.mask_token.sum()

    t_losses = []
    for it in range(3):
        lr = float(warmup_cosine_lr(jnp.asarray(it), max_lr=optim.max_lr,
                                    warmup_iters=optim.warmup_iters,
                                    total_iters=optim.total_iters,
                                    min_lr=optim.min_lr))
        for g in tsam.param_groups:
            g["lr"] = lr
        tsam.zero_grad()
        loss = t_loss()
        t_losses.append(float(loss.detach()))
        loss.backward()
        tsam.first_step(zero_grad=True)
        t_loss().backward()
        tsam.second_step(zero_grad=True)
        # reference EMA: decay min(0.9999, (1+n)/(10+n)), n = nb_iter/2
        # (utils/utils.py:158-173, train.py:128)
        n = it / 2.0
        d = min(optim.ema_decay, (1.0 + n) / (10.0 + n))
        with torch.no_grad():
            for k, v in tmodel.state_dict().items():
                if ema_sd[k].dtype.is_floating_point:
                    ema_sd[k].mul_(d).add_((1.0 - d) * v.float())

    # ---- our side: one jitted SAM step ------------------------------------
    from htr_vt_tpu.optim.sam import make_base_optimizer
    from htr_vt_tpu.train.state import TrainState
    from htr_vt_tpu.train.step import jit_train_step

    model = HTRVT(cfg.model)
    tx_opt = make_base_optimizer(cfg.optim)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=stats, opt_state=tx_opt.init(params),
                       ema_params=jax.tree.map(jnp.copy, params),
                       ema_batch_stats=jax.tree.map(jnp.copy, stats),
                       rng=jax.random.PRNGKey(0))
    batch = {"image": jnp.asarray(x), "labels": jnp.asarray(labels),
             "label_lengths": jnp.asarray(lengths)}
    step_fn = jit_train_step(model, cfg, donate=False)
    j_losses = []
    for _ in range(3):
        state, metrics = step_fn(state, batch)
        j_losses.append(float(metrics["loss"]))

    # torch-CPU (oneDNN) vs XLA-CPU convolution accumulation order puts
    # ~1e-4-relative noise in the logits; the 2-sample BatchNorm and the CTC
    # sum over frames amplify it to ~1e-3 on the loss. Semantic divergence
    # (wrong lr, wrong wd, wrong SAM math) shows up orders of magnitude above
    # this band — see the per-parameter check below.
    np.testing.assert_allclose(j_losses, t_losses, rtol=6e-3)

    # Parameters after 3 SAM iterations. Tolerance note: Adam's update is
    # sign-like (m_hat/sqrt(v_hat) ~ +-1 after bias correction), so for the
    # few elements whose gradient sits at the cross-backend fp32 noise floor
    # the torch and JAX updates can take OPPOSITE signs, diverging by up to
    # sum(lr) ~ 1.5e-3 — observed on ~2% of conv1's elements. That is a
    # property of Adam under any backend noise, not a semantic mismatch; a
    # real bug (wrong lr / wd / SAM rho / EMA decay) shifts every element
    # systematically. So assert (a) tight aggregate relative-L2 agreement and
    # (b) that outliers beyond the sign-flip scale are rare and bounded.
    lr_sum = sum(float(warmup_cosine_lr(jnp.asarray(i), max_lr=optim.max_lr,
                                        warmup_iters=optim.warmup_iters,
                                        total_iters=optim.total_iters,
                                        min_lr=optim.min_lr)) for i in range(3))

    def check(got_sd, want_sd, what):
        for k, want in want_sd.items():
            # pos_embed is fixed; running stats are excluded because (a) the
            # running-var convention differs (flax biased vs torch unbiased)
            # and (b) running means inherit the Adam sign-flip weight
            # divergence scaled by activations, not by lr — their per-forward
            # update parity is pinned separately (3.5e-8 after one forward;
            # see test_torch_parity.test_batchnorm_*).
            if (k == "pos_embed" or k.endswith("num_batches_tracked")
                    or k.endswith("running_var") or k.endswith("running_mean")):
                continue
            got, want = np.asarray(got_sd[k]), np.asarray(want)
            diff = np.abs(got - want)
            # All thresholds scale with lr_sum, the maximum any element can
            # move in 3 Adam steps (so also the maximum any sign flip can
            # diverge). Normalizing by |param| instead would blow up on the
            # zero-initialized biases.
            assert float(diff.mean()) < 0.1 * lr_sum + 1e-6, \
                f"{what} {k}: mean diff {diff.mean()} vs lr budget {lr_sum}"
            outliers = float(np.mean(diff > 0.2 * lr_sum))
            assert outliers < 0.08, f"{what} {k}: {outliers:.1%} outliers"
            # m_hat/sqrt(v_hat) can exceed 1 in the first steps, so a full
            # sign flip can diverge by a bit over 2*sum(lr).
            assert float(diff.max()) < 3.0 * lr_sum + 1e-4, \
                f"{what} {k}: max diff {diff.max()} vs lr budget {lr_sum}"

    from htr_vt_tpu.utils.torch_convert import tree_to_reference_state_dict
    got_sd = tree_to_reference_state_dict(
        jax.tree.map(np.asarray, state.params),
        jax.tree.map(np.asarray, state.batch_stats))
    want_sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    check(got_sd, want_sd, "params")

    got_ema = tree_to_reference_state_dict(
        jax.tree.map(np.asarray, state.ema_params),
        jax.tree.map(np.asarray, state.ema_batch_stats))
    check(got_ema, {k: v.numpy() for k, v in ema_sd.items()}, "EMA")
