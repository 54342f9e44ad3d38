"""Training state pytree."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from htr_vt_tpu.config import ExperimentConfig
from htr_vt_tpu.optim.sam import make_base_optimizer


@struct.dataclass
class TrainState:
    """Everything a training step consumes and produces.

    Mirrors the reference checkpoint content (model + EMA state_dicts,
    optimizer, iteration — model_v1/train.py:156-172) as one immutable pytree.
    The EMA covers params *and* BatchNorm running stats, like torch's
    full-state_dict ModelEma.
    """

    step: jax.Array          # int32 scalar
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any
    rng: jax.Array           # PRNG key consumed by masking/dropout per step


def create_train_state(cfg: ExperimentConfig, model, rng: jax.Array,
                       sample_image: jax.Array, sgm_sample=None) -> TrainState:
    """Initialize parameters/EMA/optimizer from a sample batch shape.
    ``sgm_sample``: dummy sgm_left/right/tgt/mask arrays when the SGM head is
    enabled (its params must exist at init)."""
    import numpy as np
    init_rng, state_rng = jax.random.split(rng)
    args = (sample_image,)
    kwargs = {}
    if cfg.model.model_type == "encoder_decoder":
        args = (sample_image,
                np.zeros((sample_image.shape[0], cfg.model.max_seq_len), np.int32))
    elif cfg.model.sgm.enable and sgm_sample is not None:
        kwargs["sgm_batch"] = sgm_sample
    variables = model.init(
        {"params": init_rng, "mask": init_rng, "dropout": init_rng},
        *args, train=False, **kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_base_optimizer(cfg.optim)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
        ema_batch_stats=jax.tree.map(jnp.copy, batch_stats),
        rng=state_rng,
    )


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
