"""On-chip profiler for the training step: per-HLO-op time table.

Runs the jitted SAM train step under jax.profiler.trace and parses the
xplane with tensorboard_plugin_profile to print where the milliseconds go.

Usage: python tools/profile_step.py [--mode full|fwd|fwdbwd|stem|vit] [--bs 128]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(mode: str, bs: int):
    import jax
    import jax.numpy as jnp

    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from htr_vt_tpu.config import ExperimentConfig, MaskConfig, ModelConfig, OptimConfig
    from htr_vt_tpu.models.htr_vt import HTRVT
    from htr_vt_tpu.train.state import create_train_state
    from htr_vt_tpu.train.step import jit_train_step

    cfg = ExperimentConfig(
        model=ModelConfig(nb_cls=80, masking=MaskConfig(mode="span", ratio=0.4,
                                                        max_span_length=8),
                          conv_impl=os.environ.get("HTRVT_CONV_IMPL", "auto"),
                          pool_impl=os.environ.get("HTRVT_POOL_IMPL", "auto")),
        optim=OptimConfig(),
    )
    model = HTRVT(cfg.model)
    rng = np.random.default_rng(0)
    sample = np.zeros((bs, 64, 512, 1), np.float32)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), sample)
    batch = {
        "image": jnp.asarray(rng.random((bs, 64, 512, 1), dtype=np.float32)),
        "labels": jnp.asarray(rng.integers(1, 80, (bs, 96)).astype(np.int32)),
        "label_lengths": jnp.asarray(rng.integers(30, 90, (bs,)).astype(np.int32)),
    }

    if mode == "full":
        fn = jit_train_step(model, cfg, donate=False)
        def run(s=state):
            s2, m = fn(s, batch)
            return jnp.sum(jax.tree.leaves(s2.ema_params)[0])
        return run
    if mode == "fwdbwd":
        from htr_vt_tpu.train.step import make_loss_fn
        loss_fn = make_loss_fn(model, cfg)
        @jax.jit
        def fb(params, bs_, b, r):
            (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params, bs_, b, r)
            return l, jax.tree.map(lambda x: jnp.sum(x), g)
        def run():
            l, g = fb(state.params, state.batch_stats, batch, jax.random.PRNGKey(1))
            return l
        return run
    if mode == "fwd":
        @jax.jit
        def f(params, bs_, img):
            return model.apply({"params": params, "batch_stats": bs_}, img,
                               train=False).sum()
        def run():
            return f(state.params, state.batch_stats, batch["image"])
        return run
    if mode == "stem":
        from htr_vt_tpu.models.stem import ResNet18Stem
        stem = ResNet18Stem(embed_dim=768)
        vs = stem.init(jax.random.PRNGKey(0), sample[:1], train=True)
        @jax.jit
        def f(p, bs_, img):
            def loss(p):
                out, mut = stem.apply({"params": p, "batch_stats": bs_}, img,
                                      train=True, mutable=["batch_stats"])
                return (out.astype(jnp.float32) ** 2).mean()
            return jax.value_and_grad(loss)(p)[0]
        def run():
            return f(vs["params"], vs["batch_stats"], batch["image"])
        return run
    raise SystemExit(f"unknown mode {mode}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="full")
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax

    run = build(args.mode, args.bs)
    # warmup/compile
    float(run())
    float(run())

    trace_dir = f"/tmp/htrvt_trace_{args.mode}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.iters):
            x = run()
        float(x)

    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        print("no xplane captured", file=sys.stderr)
        return
    xplane = max(xplanes, key=os.path.getmtime)
    report(xplane, args.iters, args.top)


def report(xplane_path: str, iters: int, top: int) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        agg = {}
        total_ns = 0
        for line in plane.lines:
            lname = line.name
            if "XLA Ops" not in lname and "xla.op" not in lname.lower():
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                name = md.name
                dur = ev.duration_ps / 1e3  # ns
                cat = ""
                for st in list(ev.stats) + list(md.stats):
                    sname = stat_meta[st.metadata_id].name
                    if sname in ("hlo_category", "equation", "tf_op"):
                        v = st.str_value or (stat_meta[st.ref_value].name
                                             if st.ref_value else "")
                        if sname == "hlo_category":
                            cat = v
                key = (cat, _bucket(name))
                a = agg.setdefault(key, [0.0, 0])
                a[0] += dur
                a[1] += 1
                total_ns += dur
        if not agg:
            continue
        print(f"\n=== plane {plane.name}: total {total_ns/1e6/iters:.2f} ms/iter "
              f"over {iters} iters ===")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        print(f"{'ms/iter':>9} {'%':>5} {'count':>6}  category / op bucket")
        for (cat, name), (ns, cnt) in rows[:top]:
            print(f"{ns/1e6/iters:9.3f} {100*ns/total_ns:5.1f} {cnt:6d}  "
                  f"[{cat}] {name}")
        bycat = {}
        for (cat, _), (ns, cnt) in agg.items():
            bycat[cat] = bycat.get(cat, 0.0) + ns
        print("\n-- by category --")
        for cat, ns in sorted(bycat.items(), key=lambda kv: -kv[1]):
            print(f"{ns/1e6/iters:9.3f} {100*ns/total_ns:5.1f}  {cat}")


def _bucket(name: str) -> str:
    """Strip trailing digits/ids so fusion.123 variants aggregate."""
    import re
    return re.sub(r"[.\-_]?\d+$", "", name)


if __name__ == "__main__":
    main()
