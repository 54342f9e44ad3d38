"""List per-op busy time from an existing xplane trace, excluding async DMA.

Async copy-start/async-start event *durations* span their overlap window, not
busy time, so summing them wildly over-counts (docs/PERF.md gotchas). This
tool keeps only compute categories and prints every distinct op (no
bucketing) with its HLO text head, so individual conv/matmul fusions can be
attributed to model sites.

Usage: python tools/trace_ops.py <trace_dir_or_xplane> <iters> [top]
"""

from __future__ import annotations

import glob
import os
import sys

SKIP_CATS = {"copy-start", "copy-done", "async-start", "async-done", ""}


def main():
    path = sys.argv[1]
    iters = int(sys.argv[2])
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    if os.path.isdir(path):
        path = max(glob.glob(f"{path}/**/*.xplane.pb", recursive=True),
                   key=os.path.getmtime)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        agg = {}
        total_ns = 0.0
        for line in plane.lines:
            if "XLA Ops" not in line.name and "xla.op" not in line.name.lower():
                continue
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                dur = ev.duration_ps / 1e3
                cat, text = "", ""
                for st in list(ev.stats) + list(md.stats):
                    sname = stat_meta[st.metadata_id].name
                    v = st.str_value or (stat_meta[st.ref_value].name
                                         if st.ref_value else "")
                    if sname == "hlo_category":
                        cat = v
                    elif sname in ("hlo_text", "long_name", "hlo_op_expression"):
                        text = text or v
                if cat in SKIP_CATS:
                    continue
                key = (cat, md.name, (text or md.name)[:160])
                a = agg.setdefault(key, [0.0, 0])
                a[0] += dur
                a[1] += 1
                total_ns += dur
        if not agg:
            continue
        print(f"\n=== {plane.name}: busy {total_ns/1e6/iters:.2f} ms/iter ===")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        for (cat, name, text), (ns, cnt) in rows[:top]:
            print(f"{ns/1e6/iters:8.3f} ms {100*ns/total_ns:5.1f}% x{cnt:<4d} "
                  f"[{cat}] {name}\n      {text}")
        bycat = {}
        for (cat, _, _), (ns, _) in agg.items():
            bycat[cat] = bycat.get(cat, 0.0) + ns
        print("\n-- busy by category --")
        for cat, ns in sorted(bycat.items(), key=lambda kv: -kv[1]):
            print(f"{ns/1e6/iters:9.3f} {100*ns/total_ns:5.1f}  {cat}")


if __name__ == "__main__":
    main()
