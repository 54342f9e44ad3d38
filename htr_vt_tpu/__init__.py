"""htr_vt_tpu — a TPU-native handwritten-text-recognition framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of the HTR-VT
reference codebase (0xk0ry/HTR-VT): ResNet+ViT line recognizers trained with
CTC, span masking, SAM and EMA, evaluated with CER/WER, plus the full variant
zoo (windowed attention, SGM auxiliary loss, MMS masking, Conformer /
SqueezeFormer / Swin / SVTR / VAN / local-global encoders) expressed as
*configurations over one shared core* instead of copied trees.

Design pillars
--------------
- Fixed static shapes end-to-end (H=64, W=512 -> 128 tokens) so XLA compiles
  one program; the reference reaches the same invariant via preprocessing
  (reference: ``data/dataset.py:104-135``).
- bfloat16 matmul path onto the MXU, float32 parameters and reductions.
- Data parallelism as sharding: ``jax.sharding.Mesh`` + ``NamedSharding``;
  gradients are reduced by XLA collectives over ICI, not hand-written NCCL.
- The training step (two SAM passes, EMA update, schedule) is a single
  ``jit``-compiled pure function.
- Host-side work (image decode, augmentation, metrics) stays off-device and
  overlaps with the accelerator via a prefetching loader.
"""

__version__ = "0.1.0"

from htr_vt_tpu.config import (  # noqa: F401
    DataConfig,
    MaskConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    ExperimentConfig,
)
