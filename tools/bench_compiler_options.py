"""Probe: can per-compile ``compiler_options`` reach the TPU compiler?

tools/sweep_xla_flags.py measured the env-var route dead under the axon
remote-compile runtime: every ``--xla_tpu_*`` candidate is rejected at
*client* backend init ("Unknown flag in XLA_FLAGS", F-level abort) because
the client-side XLA build doesn't link the TPU compiler — compilation
happens on the remote service. JAX's AOT path
(``jit(f).lower(args).compile(compiler_options=...)``) serializes options
INTO the compile request, so it is the only route that could reach the
remote compiler's flag table. This probe lowers the full SAM train step
once, compiles it under each candidate option set, and times 30 donated
steps per compile (same readback sync as bench.py).

Outcome either way closes the round-2 "conv 78% plateau — no public flag
found" thread with a measurement: the options either apply (and the table
shows their effect) or the service rejects them (recorded verbatim).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANDIDATES = [
    ("baseline", {}),
    # Bigger scoped-vmem budget lets the emitter pick larger conv tiles.
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_128m", {"xla_tpu_scoped_vmem_limit_kib": "131072"}),
    # Disable dot strength-reduction rewrites (same knob sweep_xla_flags.py
    # calls 'no_rewrites').
    ("no_dot_strength_red", {"xla_tpu_enable_dot_strength_reduction": "false"}),
]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from htr_vt_tpu.config import (ExperimentConfig, MaskConfig, ModelConfig,
                                   OptimConfig)
    from htr_vt_tpu.models.htr_vt import HTRVT
    from htr_vt_tpu.parallel.mesh import batch_sharding, make_mesh
    from htr_vt_tpu.train.state import create_train_state
    from htr_vt_tpu.train.step import jit_train_step

    cfg = ExperimentConfig(
        model=ModelConfig(nb_cls=80, masking=MaskConfig(
            mode="span", ratio=0.4, max_span_length=8)),
        optim=OptimConfig(),
    )
    bs = 128
    model = HTRVT(cfg.model)
    mesh = make_mesh()
    bsh = batch_sharding(mesh)
    rng = np.random.default_rng(0)
    sample = np.zeros((bs, 64, 512, 1), np.float32)
    state0 = create_train_state(cfg, model, jax.random.PRNGKey(0), sample)
    batch = {
        "image": jax.device_put(
            rng.random((bs, 64, 512, 1), dtype=np.float32), bsh),
        "labels": jax.device_put(
            rng.integers(1, 80, (bs, 96)).astype(np.int32), bsh),
        "label_lengths": jax.device_put(
            rng.integers(30, 90, (bs,)).astype(np.int32), bsh),
    }

    train_fn = jit_train_step(model, cfg, donate=True)
    lowered = train_fn.lower(state0, batch)

    results = []
    for name, opts in CANDIDATES:
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(compiler_options=opts or None)
            compile_s = time.perf_counter() - t0
        except Exception as e:
            print(f"{name:16s} COMPILE REJECTED: {str(e)[:200]}", flush=True)
            results.append({"name": name, "opts": opts,
                            "error": str(e)[:500]})
            continue
        # fresh state per candidate: steps donate their input
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), sample)
        for _ in range(3):
            state, _ = compiled(state, batch)
        float(jnp.sum(jax.tree.leaves(state.ema_params)[0]))
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            state, _ = compiled(state, batch)
        float(jnp.sum(jax.tree.leaves(state.ema_params)[0]))
        dt = time.perf_counter() - t0
        rate = iters * bs / dt
        print(f"{name:16s} {rate:7.1f} img/s  ({dt / iters * 1e3:6.1f} ms/step,"
              f" compile {compile_s:.0f}s)", flush=True)
        results.append({"name": name, "opts": opts,
                        "imgs_per_sec": round(rate, 1),
                        "ms_per_step": round(dt / iters * 1e3, 1)})

    with open("/tmp/bench_compiler_options.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
