"""Does the exported StableHLO bundle serve as fast as the live jit?

Measures the deployment tax of the AOT path (deploy.py): flagship model,
bs 128, 64x512, float and calibrated-int8 — live `jax.jit` call vs the
deserialized `jax.export` artifact's `.call`. Both run the same XLA
executable; this pins that the exported calling convention adds no
per-batch overhead that matters at serving rates (~27 ms/batch bf16).

Run on a TPU host: `python tools/bench_bundle.py`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _throughput(fn, img, reps=20):
    out = fn(img)
    _ = np.asarray(out[0])  # compile/load + honest sync via host readback
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(img)
    _ = np.asarray(out[0])
    dt = (time.perf_counter() - t0) / reps
    return img.shape[0] / dt, dt * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import dataclasses
    import tempfile

    from htr_vt_tpu.config import ModelConfig
    from htr_vt_tpu.deploy import (ServingBundle, export_serving,
                                   make_serving_fn, save_bundle)
    from htr_vt_tpu.models.htr_vt import build_model

    bs = int(os.environ.get("HTRVT_BS", "128"))
    backend = jax.default_backend()
    platforms = [backend]  # single-platform: keeps auto attn/quant kernels
    rng = np.random.default_rng(0)
    img = rng.standard_normal((bs, 64, 512, 1)).astype(np.float32)

    for quant in ("none", "int8"):
        cfg = ModelConfig(nb_cls=80, quant=quant)
        model = build_model(cfg)
        variables = dict(model.init({"params": jax.random.PRNGKey(0)},
                                    jnp.asarray(img[:1]), train=False))
        if quant == "int8":
            from htr_vt_tpu.ops.quant import calibrate_quant_stats
            variables["quant_stats"] = calibrate_quant_stats(
                model, variables, [img], n_batches=1)

        live = jax.jit(make_serving_fn(model, variables))
        live_ips, live_ms = _throughput(live, img)

        with tempfile.TemporaryDirectory() as d:
            data = export_serving(model, variables, bs, (64, 512),
                                  platforms=platforms)
            save_bundle(d, {512: data}, {
                "charset": ["[blank]"] + list("abcdefghijklmnopqrstuvwxyz"),
                "height": 64, "batch_size": bs, "quant": quant})
            bundle = ServingBundle(d)
            aot_ips, aot_ms = _throughput(lambda x: bundle.run(x), img)
            size_mb = len(data) / 1e6

        print(f"{quant:5s} live {live_ips:8.1f} img/s ({live_ms:6.2f} ms)  "
              f"bundle {aot_ips:8.1f} img/s ({aot_ms:6.2f} ms)  "
              f"tax {100 * (1 - aot_ips / live_ips):+5.1f}%  "
              f"artifact {size_mb:.0f} MB")


if __name__ == "__main__":
    main()
