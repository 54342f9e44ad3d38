"""AOT serving artifacts: serialized StableHLO via ``jax.export``.

The reference has no deployment story — serving means running the torch
script with the full model source tree importable
(model_window/quick_inference.py:16-100). Here the serving computation
(eval-mode forward + on-device greedy CTC collapse) is exported as a
self-contained, versioned StableHLO artifact: the weights are baked in as
constants, the lowering carries platform checks (tpu/cpu), and loading
needs jax only — none of the model code. This is the TPU-idiomatic
equivalent of TorchScript/ONNX export, with XLA as the stable runtime.

A bundle directory holds one artifact per serving width bucket (static
shapes stay static — the same per-bucket-program design as
cli/serve.py --width-buckets) plus ``meta.json`` carrying everything a
server needs to decode: the charset, canvas geometry, batch size and quant
mode.

    bundle/
      meta.json
      w0512.stablehlo          # fn(image[B,H,512,1]) -> (ids, lengths)
      w1024.stablehlo
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

META_NAME = "meta.json"
FORMAT_VERSION = 1


def make_serving_fn(model, variables):
    """Close model+weights into ``image -> (collapsed_ids, lengths)``.

    The greedy CTC collapse (ops/decode.py) runs inside the exported
    program, so a server ships only [B, T] int32 ids off the chip.
    """
    from htr_vt_tpu.ops.decode import greedy_decode

    def fn(image):
        logits = model.apply(variables, image, train=False)
        ids, lengths = greedy_decode(logits)
        return ids, lengths

    return fn


def export_serving(model, variables, batch_size: int,
                   img_size: Tuple[int, int],
                   platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize the serving fn for a fixed [B, H, W, 1] input shape.

    ``platforms``: lowering targets (default: current backend + cpu, so an
    artifact exported on a TPU host remains loadable in CPU CI).
    """
    import jax
    from jax import export as jexport

    if platforms is None:
        backend = jax.default_backend()
        platforms = [backend] if backend == "cpu" else [backend, "cpu"]
    fn = make_serving_fn(model, variables)
    spec = jax.ShapeDtypeStruct((batch_size, *img_size, 1), np.float32)
    exp = jexport.export(jax.jit(fn), platforms=list(platforms))(spec)
    return exp.serialize()


def save_bundle(out_dir: str, artifacts: Dict[int, bytes], meta: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    meta = dict(meta, format_version=FORMAT_VERSION,
                widths=sorted(artifacts))
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f, indent=1)
    for width, data in artifacts.items():
        with open(os.path.join(out_dir, f"w{width:04d}.stablehlo"), "wb") as f:
            f.write(data)


class ServingBundle:
    """Loads an exported bundle and serves it. Needs jax + the charset in
    meta.json — no htr_vt_tpu model code."""

    def __init__(self, out_dir: str):
        from jax import export as jexport

        with open(os.path.join(out_dir, META_NAME)) as f:
            self.meta = json.load(f)
        if self.meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"bundle format {self.meta.get('format_version')!r} != "
                f"supported {FORMAT_VERSION}")
        self.batch_size: int = self.meta["batch_size"]
        self.height: int = self.meta["height"]
        self.charset: List[str] = self.meta["charset"]
        self._fns = {}
        for width in self.meta["widths"]:
            path = os.path.join(out_dir, f"w{width:04d}.stablehlo")
            with open(path, "rb") as f:
                self._fns[width] = jexport.deserialize(f.read())

    @property
    def widths(self) -> List[int]:
        return sorted(self._fns)

    def run(self, images: np.ndarray, width: Optional[int] = None):
        """[B, H, W, 1] float32 -> (ids [B, T], lengths [B]) numpy."""
        width = images.shape[2] if width is None else width
        if width not in self._fns:
            raise KeyError(f"no artifact for width {width}; have {self.widths}")
        ids, lengths = self._fns[width].call(images)
        return np.asarray(ids), np.asarray(lengths)

    def decode(self, ids: np.ndarray, lengths: np.ndarray) -> List[str]:
        # charset[0] is the blank; ids are already CTC-collapsed in-program.
        return ["".join(self.charset[i] for i in row[:n])
                for row, n in zip(ids, lengths)]

    def transcribe(self, images: np.ndarray) -> List[str]:
        """Pad the batch to the bundle batch size, run, decode."""
        b = images.shape[0]
        bs = self.batch_size
        out: List[str] = []
        for lo in range(0, b, bs):
            chunk = images[lo:lo + bs]
            if chunk.shape[0] < bs:
                pad = np.ones((bs - chunk.shape[0], *chunk.shape[1:]),
                              chunk.dtype)
                chunk = np.concatenate([chunk, pad], axis=0)
            ids, lengths = self.run(chunk)
            out.extend(self.decode(ids, lengths)[:min(bs, b - lo)])
        return out
