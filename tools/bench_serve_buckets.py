"""Width-bucketed serving throughput: per-bucket device rate + the effective
img/s on a realistic natural-width workload.

The reference serves every line through one fixed 512-px program
(model_v1/data/dataset.py:104-111 resizes/pads everything to W=512), so a
40-char line pays the same compute as a full-width one. Width bucketing
(cli/serve.py --width-buckets) routes each image to the smallest compiled
program that holds its natural aspect-resized width; short lines run through
a 256-px program at roughly twice the rate. This tool measures what that
buys end-to-end:

  1. per-bucket device throughput (eval forward + on-device greedy decode,
     bs 128) for each width, float or int8 (HTRVT_QUANT=int8);
  2. the bucket mix of a realistic workload — the same natural-width line
     generator `cli/serve.py --selftest` uses (uniform 6..96-char lines,
     width = chars*24 + 32), whose per-bucket CER the selftest scores;
  3. the workload-effective throughput 1 / sum(frac_b / rate_b).

Prints one JSON line (bench.py shape). Accuracy evidence for the same
workload: `cli/serve.py --selftest --width-buckets ...` per-bucket CER.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE_INFER_IMGS_PER_SEC = 1300.0  # same 4090 estimate as bench_infer.py


def workload_mix(buckets, n=4096, seed=0,
                 alphabet="abcdefghijklmnopqrstuvwxyz '"):
    """Bucket mix of the serve --selftest workload, using the SAME generator
    helpers cli/serve.py uses (htr_vt_tpu.data.synthetic.selftest_*): the
    max length ramps 6..96 over the job, the line length is uniform in
    [4, max_len], natural width = chars*24 + 32, routed to the smallest
    bucket that holds the width (capped at the largest, like
    assign_width_buckets)."""
    from htr_vt_tpu.data.synthetic import (random_text, selftest_canvas_width,
                                           selftest_max_len)
    rng = np.random.default_rng(seed)
    counts = {b: 0 for b in buckets}
    for i in range(n):
        text = random_text(rng, alphabet, min_len=4,
                           max_len=selftest_max_len(i, n))
        w = selftest_canvas_width(len(text))
        b = next((b for b in sorted(buckets) if w <= b), max(buckets))
        counts[b] += 1
    return {b: c / n for b, c in counts.items()}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from htr_vt_tpu.config import ExperimentConfig, ModelConfig, OptimConfig
    from htr_vt_tpu.models.htr_vt import HTRVT
    from htr_vt_tpu.ops.decode import greedy_decode
    from htr_vt_tpu.train.state import create_train_state

    quant = os.environ.get("HTRVT_QUANT", "int8")
    buckets = [int(x) for x in
               os.environ.get("HTRVT_BUCKETS", "256,512").split(",")]
    batch_size = int(os.environ.get("HTRVT_BS", "128"))
    rng = np.random.default_rng(0)

    rates = {}
    for width in buckets:
        cfg = ExperimentConfig(model=ModelConfig(
            nb_cls=80, img_size=(64, width), quant=quant,
            quant_stage1_pad=int(os.environ.get("HTRVT_STAGE1_PAD", "256")),
            quant_gelu=os.environ.get("HTRVT_QUANT_GELU", "quick")),
            optim=OptimConfig())
        model = HTRVT(cfg.model)
        sample = np.zeros((batch_size, 64, width, 1), np.float32)
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), sample)
        image = jnp.asarray(
            rng.random((batch_size, 64, width, 1), dtype=np.float32))

        extra = {}
        if quant == "int8":
            from htr_vt_tpu.ops.quant import calibrate_quant_stats
            extra["quant_stats"] = calibrate_quant_stats(
                model, {"params": state.ema_params,
                        "batch_stats": state.ema_batch_stats},
                [image], n_batches=1)

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
        rates[width] = iters * batch_size / dt
        print(f"# bucket {width}: {rates[width]:,.0f} img/s "
              f"({dt / iters * 1e3:.1f} ms/batch)", file=sys.stderr)

    mix = workload_mix(buckets)
    effective = 1.0 / sum(frac / rates[b] for b, frac in mix.items() if frac)
    flat_512 = rates.get(512) or min(rates.values())
    print(json.dumps({
        "metric": f"serve_bucketed_images_per_sec_per_chip_{quant}",
        "value": round(effective, 1),
        "unit": "img/s",
        "vs_baseline": round(effective / REFERENCE_INFER_IMGS_PER_SEC, 2),
        "buckets": {str(b): round(rates[b], 1) for b in buckets},
        "workload_mix": {str(b): round(f, 3) for b, f in mix.items()},
        "vs_flat_512": round(effective / flat_512, 2),
        "batch_size": batch_size,
    }))


if __name__ == "__main__":
    main()
