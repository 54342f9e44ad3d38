"""Diff two profiler traces op-bucket by op-bucket.

Usage: python tools/trace_diff.py <trace_dir_A> <trace_dir_B> [iters]
Prints buckets sorted by |time_B - time_A| so regressions/wins stand out.
Async categories (copy-start/async-start, prefetch overlap) are separated
from busy compute.
"""

from __future__ import annotations

import glob
import os
import re
import sys

ASYNC = {"copy-start", "async-start", "copy-done", "async-done"}


def load(trace_dir: str, iters: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    space = xplane_pb2.XSpace()
    with open(max(xplanes, key=os.path.getmtime), "rb") as f:
        space.ParseFromString(f.read())
    agg = {}
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                cat = ""
                for st in list(ev.stats) + list(md.stats):
                    if stat_meta[st.metadata_id].name == "hlo_category":
                        cat = st.str_value or (
                            stat_meta[st.ref_value].name if st.ref_value else "")
                name = re.sub(r"[.\-_]?\d+$", "", md.name)
                key = (cat, name)
                agg[key] = agg.get(key, 0.0) + ev.duration_ps / 1e9 / iters
    return agg


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    a, b = load(a_dir, iters), load(b_dir, iters)
    keys = set(a) | set(b)
    rows = sorted(keys, key=lambda k: -abs(b.get(k, 0.0) - a.get(k, 0.0)))
    busy_a = sum(v for (c, _), v in a.items() if c not in ASYNC)
    busy_b = sum(v for (c, _), v in b.items() if c not in ASYNC)
    print(f"busy compute ms/iter: A={busy_a:.1f}  B={busy_b:.1f}  "
          f"delta={busy_b - busy_a:+.1f}")
    print(f"{'A ms':>8} {'B ms':>8} {'delta':>8}  category / bucket")
    for k in rows[:40]:
        va, vb = a.get(k, 0.0), b.get(k, 0.0)
        cat, name = k
        tag = " (async)" if cat in ASYNC else ""
        print(f"{va:8.3f} {vb:8.3f} {vb - va:+8.3f}  [{cat}] {name[:70]}{tag}")


if __name__ == "__main__":
    main()
