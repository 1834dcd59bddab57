"""Aggregate a jax.profiler xplane trace into a top-ops table.

Usage:
  python tools/trace_top_ops.py <trace_dir_or_xplane.pb> [--top N]

Walks the device plane's "XLA Ops" line, sums durations per HLO op
(and per category when the metadata carries one), and prints a table of
the top-N ops by total device time — the attribution the utilization
work in BENCHMARKS.md is based on.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        raise FileNotFoundError(f"no *.xplane.pb under {path}")
    return hits[-1]


def load_xspace(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_op_totals(xs, line_name: str = "XLA Ops"):
    """Returns (totals {display_name: ps}, categories {category: ps},
    plane_span_ps)."""
    totals: dict = collections.Counter()
    cats: dict = collections.Counter()
    span = 0
    for plane in xs.planes:
        if not plane.name.startswith("/device:"):
            continue
        meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        for line in plane.lines:
            if line.name != line_name:
                continue
            for ev in line.events:
                m = meta[ev.metadata_id]
                name = m.display_name or m.name
                totals[name] += ev.duration_ps
                span += ev.duration_ps
                cat = None
                for st in m.stats:
                    sname = stat_meta[st.metadata_id].name
                    if sname in ("hlo_category", "category"):
                        cat = (st.str_value
                               or stat_meta[st.ref_value].name)
                if cat:
                    cats[cat] += ev.duration_ps
    return totals, cats, span


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", help="trace dir or xplane.pb path")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--steps", type=int, default=0,
                    help="optimizer steps in the trace (prints ms/step)")
    args = ap.parse_args()

    xs = load_xspace(find_xplane(args.trace))
    totals, cats, span = device_op_totals(xs)
    if not totals:
        print("no device XLA Ops events found", file=sys.stderr)
        sys.exit(1)

    def ms(ps: int) -> float:
        return ps / 1e9

    print(f"total device op time: {ms(span):.1f} ms"
          + (f"  ({ms(span) / args.steps:.2f} ms/step)" if args.steps
             else ""))
    if cats:
        print("\nby category:")
        for cat, ps in sorted(cats.items(), key=lambda kv: -kv[1]):
            line = f"  {cat:<28} {ms(ps):9.1f} ms  {100*ps/span:5.1f}%"
            if args.steps:
                line += f"  {ms(ps)/args.steps:7.3f} ms/step"
            print(line)
    print(f"\ntop {args.top} ops:")
    for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:args.top]:
        line = f"  {name[:70]:<70} {ms(ps):9.1f} ms  {100*ps/span:5.1f}%"
        if args.steps:
            line += f"  {ms(ps)/args.steps:7.3f} ms/step"
        print(line)


if __name__ == "__main__":
    main()
