"""Timeline gap analysis for an xplane trace: find and name on-device idle.

Reconstructs the per-core XLA-op timeline (start/end from event offsets) and
prints every gap above a threshold with the ops on either side, aggregated
across iterations by (before-op, after-op) pair. This is the tool that turns
"~12 ms schedule idle" (docs/PERF.md) into named, attributable gaps.

Usage: python tools/trace_gaps.py <trace_dir_or_xplane> <iters> [min_gap_us]
"""

from __future__ import annotations

import glob
import os
import sys


def main():
    path = sys.argv[1]
    iters = int(sys.argv[2])
    min_gap_us = float(sys.argv[3]) if len(sys.argv) > 3 else 50.0
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
        for line in plane.lines:
            if "XLA Ops" not in line.name and "xla.op" not in line.name.lower():
                continue
            evs = []
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                start = ev.offset_ps / 1e6  # us
                dur = ev.duration_ps / 1e6
                evs.append((start, start + dur, md.name))
            if not evs:
                continue
            evs.sort()
            total_span = evs[-1][1] - evs[0][0]
            busy = 0.0
            cursor = evs[0][0]
            gaps = {}
            prev_name = None
            prev_end = evs[0][0]
            for s, e, name in evs:
                if s > cursor:
                    gap = s - cursor
                    if gap >= min_gap_us and prev_name is not None:
                        key = (prev_name, name)
                        a = gaps.setdefault(key, [0.0, 0])
                        a[0] += gap
                        a[1] += 1
                    cursor = s
                if e > cursor:
                    busy += e - cursor
                    cursor = e
                    prev_name = name
            print(f"\n=== {plane.name} / {line.name}: span "
                  f"{total_span/1e3/iters:.2f} ms/iter, busy "
                  f"{busy/1e3/iters:.2f}, idle "
                  f"{(total_span-busy)/1e3/iters:.2f} ===")
            rows = sorted(gaps.items(), key=lambda kv: -kv[1][0])
            print(f"{'ms/iter':>8} {'count':>6}  gap between")
            for (a, b), (us, cnt) in rows[:25]:
                print(f"{us/1e3/iters:8.3f} {cnt:6d}  {a[:70]}  ->  {b[:70]}")


if __name__ == "__main__":
    main()
