"""Inference throughput: eval forward + on-device greedy CTC decode on the
flagship model, one chip. Prints one JSON line (same shape as bench.py).

The 4090 baseline estimate mirrors bench.py's: ~38 GFLOP/image forward at a
realistic 45-55 TF/s sustained => ~1,300 img/s; we use 1,300.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE_INFER_IMGS_PER_SEC = 1300.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from htr_vt_tpu.config import ExperimentConfig, ModelConfig, OptimConfig
    from htr_vt_tpu.models.htr_vt import HTRVT
    from htr_vt_tpu.ops.decode import greedy_decode
    from htr_vt_tpu.train.state import create_train_state

    cfg = ExperimentConfig(model=ModelConfig(
        nb_cls=80, quant=os.environ.get("HTRVT_QUANT", "none"),
        quant_stage1_pad=int(os.environ.get("HTRVT_STAGE1_PAD", "0")),
        quant_gelu=os.environ.get("HTRVT_QUANT_GELU", "quick"),
        pool_impl=os.environ.get("HTRVT_POOL_IMPL", "auto"),
        conv_impl=os.environ.get("HTRVT_CONV_IMPL", "auto")),
        optim=OptimConfig())
    batch_size = int(os.environ.get("HTRVT_BS", "128"))
    model = HTRVT(cfg.model)
    rng = np.random.default_rng(0)
    sample = np.zeros((batch_size, 64, 512, 1), np.float32)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), sample)

    image = jnp.asarray(rng.random((batch_size, 64, 512, 1), dtype=np.float32))

    # Calibration pass for the static-scale int8 path: one float forward
    # recording per-site activation abs-max into the quant_stats collection.
    extra = {}
    if cfg.model.quant == "int8":
        def calib(params, batch_stats, image):
            _, mut = model.apply(
                {"params": params, "batch_stats": batch_stats}, image,
                train=False, mutable=["quant_stats"])
            return mut["quant_stats"]
        extra["quant_stats"] = jax.jit(calib)(
            state.ema_params, state.ema_batch_stats, image)

    @jax.jit
    def infer(params, batch_stats, image):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats, **extra},
            image, train=False)
        return greedy_decode(logits)

    out = infer(state.ema_params, state.ema_batch_stats, image)
    _ = np.asarray(jax.tree.leaves(out)[0])  # readback sync (axon gotcha)

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(state.ema_params, state.ema_batch_stats, image)
    _ = np.asarray(jax.tree.leaves(out)[0])
    dt = time.perf_counter() - t0

    if os.environ.get("HTRVT_PROFILE"):
        trace_dir = "/tmp/htrvt_trace_infer"
        os.system(f"rm -rf {trace_dir}")
        with jax.profiler.trace(trace_dir):
            for _ in range(10):
                out = infer(state.ema_params, state.ema_batch_stats, image)
            _ = np.asarray(jax.tree.leaves(out)[0])
        import glob
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from profile_step import report
        xp = max(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True),
                 key=os.path.getmtime)
        report(xp, 10, 30)

    imgs_per_sec = iters * batch_size / dt
    flops_per_image = 38e9
    print(json.dumps({
        "metric": "infer_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 1),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / REFERENCE_INFER_IMGS_PER_SEC, 2),
        "ms_per_batch": round(dt / iters * 1e3, 1),
        "batch_size": batch_size,
        "mfu": round(imgs_per_sec * flops_per_image / 197e12, 3),
    }))


if __name__ == "__main__":
    main()
