#!/usr/bin/env python
"""Aggregate per-op device times from a jax.profiler xplane trace.

Usage:
    python -m nmf_tpu.scripts.parse_xplane /tmp/trace [--top 40] [--group]

Where /tmp/trace is the directory passed to jax.profiler.start_trace. Finds
the newest *.xplane.pb under it, sums event durations on the TPU device
plane, and prints the top ops (and with --group, totals grouped by fusion
name prefix). This is the tool that exposed the serialized-scatter while
loop (ARCHITECTURE.md measurement notes).
"""
import argparse
import collections
import re
import sys
from pathlib import Path


def load_xplane(trace_dir: Path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = sorted(trace_dir.rglob("*.xplane.pb"),
                 key=lambda p: p.stat().st_mtime)
    if not pbs:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(pbs[-1].read_bytes())
    return xspace


def device_op_times(xspace, plane_substr="TPU"):
    """Return {op_name: total_ms} from the XLA Ops line of matching planes.

    A device plane has several lines (Steps, XLA Modules, XLA Ops, ...);
    only the op line gives non-overlapping per-op durations. Fall back to
    the line with the most events when no line is named "XLA Ops".
    """
    totals = collections.Counter()
    for plane in xspace.planes:
        if plane_substr not in plane.name or "SparseCore" in plane.name:
            continue
        ev_meta = plane.event_metadata
        lines = [ln for ln in plane.lines if ln.name == "XLA Ops"]
        if not lines and plane.lines:
            lines = [max(plane.lines, key=lambda ln: len(ln.events))]
        for line in lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                totals[name] += ev.duration_ps / 1e9  # ps -> ms
    return totals


GROUP_RE = re.compile(r"^(.*?)(?:\.\d+)?$")


def group_name(name: str) -> str:
    """fusion.123 -> fusion; loop_add_fusion.5 -> loop_add_fusion."""
    return GROUP_RE.match(name).group(1)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir", type=Path)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--group", action="store_true",
                    help="also print totals grouped by op-name prefix")
    ap.add_argument("--steps", type=int, default=1,
                    help="divide totals by this many profiled steps")
    args = ap.parse_args(argv)

    xspace = load_xplane(args.trace_dir)
    totals = device_op_times(xspace)
    if not totals:
        print("no TPU device plane found; planes:", file=sys.stderr)
        for plane in xspace.planes:
            print(" ", plane.name, file=sys.stderr)
        return 1
    total = sum(totals.values()) / args.steps
    print(f"total device time: {total:.2f} ms over {len(totals)} ops")
    print(f"{'ms':>9}  {'%':>5}  op")
    for name, ms in totals.most_common(args.top):
        ms /= args.steps
        print(f"{ms:9.3f}  {100 * ms / total:5.1f}  {name[:110]}")
    if args.group:
        grouped = collections.Counter()
        for name, ms in totals.items():
            grouped[group_name(name)] += ms / args.steps
        print("\ngrouped:")
        for name, ms in grouped.most_common(args.top):
            print(f"{ms:9.3f}  {100 * ms / total:5.1f}  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
