"""Encoder/variant registry.

Each reference variant directory (model_v1, model_window, model_sgm_macaron,
...) is a *named encoder recipe* here: a function that, given a ModelConfig,
returns the list of sequence-mixing blocks applied to the [B, N, D] token
stream, plus per-variant model-level options. One shared model
(htr_vt_tpu.models.htr_vt.HTRVT) hosts every recipe — no copied trees.
"""

from __future__ import annotations

from typing import Callable, Dict, List

from flax import linen as nn

_ENCODERS: Dict[str, Callable] = {}


def register_encoder(name: str):
    def deco(fn):
        _ENCODERS[name] = fn
        return fn
    return deco


def build_encoder_blocks(cfg) -> List[nn.Module]:
    """Instantiate the block stack for cfg.encoder."""
    # Import variant modules lazily so registration happens on demand and the
    # core model has no hard dependency on every variant file.
    import htr_vt_tpu.models.variants  # noqa: F401  (registers everything)

    if cfg.encoder not in _ENCODERS:
        raise ValueError(
            f"unknown encoder {cfg.encoder!r}; available: {sorted(_ENCODERS)}")
    return _ENCODERS[cfg.encoder](cfg)


def available_encoders() -> List[str]:
    import htr_vt_tpu.models.variants  # noqa: F401
    # swin and svtr are standalone model classes dispatched by build_model,
    # not block recipes — still valid --encoder values.
    return sorted(set(_ENCODERS) | {"swin", "svtr"})
