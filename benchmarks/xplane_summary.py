#!/usr/bin/env python
"""Summarize a jax.profiler xplane.pb trace: device-time per HLO op.

Usage: python benchmarks/xplane_summary.py <trace.xplane.pb> [top_n]

Parses the XSpace proto directly (tensorflow.tsl.profiler.protobuf) because
this image's tensorboard_plugin_profile is incompatible with its TF build.
Prints per-plane totals and the top-N ops by accumulated duration, with each
op's share of the device-busy time — the evidence artifact behind the
train-step optimization work (VERDICT r1 item 3).
"""

from __future__ import annotations

import collections
import sys


def summarize(path: str, top_n: int = 30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    out = []
    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        dur_by_op = collections.Counter()
        count_by_op = collections.Counter()
        total_ps = 0
        span_lo, span_hi = None, 0
        op_lines = [
            line
            for line in plane.lines
            if line.name in ("XLA Ops", "Ops") or line.name.startswith("XLA Op")
        ]
        if not op_lines:
            # no per-HLO op line on this plane: fall back to annotation-level
            # events rather than reporting nothing
            op_lines = [l for l in plane.lines if l.name == "XLA TraceMe"]
        for line in op_lines:
            # keep ONLY op-level lines: 'Steps'/'XLA TraceMe' annotations
            # overlap the op intervals and would double-count device time
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur_by_op[name] += ev.duration_ps
                count_by_op[name] += 1
                total_ps += ev.duration_ps
                t0 = ev.offset_ps
                span_lo = t0 if span_lo is None else min(span_lo, t0)
                span_hi = max(span_hi, t0 + ev.duration_ps)
        if not dur_by_op:
            continue
        out.append((plane.name, dur_by_op, count_by_op, total_ps, span_lo, span_hi))

    for name, dur, cnt, total, lo, hi in out:
        print(f"\n== plane: {name}")
        print(f"device busy: {total / 1e9:.3f} ms over span {(hi - lo) / 1e9:.3f} ms "
              f"({100 * total / max(hi - lo, 1):.0f}% busy)")
        print(f"{'op':<64} {'ms':>9} {'%busy':>6} {'count':>6}")
        for op, ps in dur.most_common(top_n):
            print(f"{op[:64]:<64} {ps / 1e9:9.3f} {100 * ps / total:6.1f} {cnt[op]:6}")
    if not out:
        print("no TPU device plane with op events found; planes:")
        for plane in space.planes:
            print(" -", plane.name, [l.name for l in plane.lines][:6])


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
