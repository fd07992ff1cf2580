#!/usr/bin/env python
"""Bucket a train-step xplane trace's per-HLO device time into the roofline
categories used by benchmarks/transformer_train_roofline.md (and the encoder
buckets shared with train_roofline.md).

Complements xplane_summary.py (flat top-N): ops are classified by the tensor
shapes in their HLO strings — decoder signals first (vocab width, MLP/attn
weight-grad shapes, the [B,T,·] token stream, attention score shapes), then
encoder conv/BN signals. The bucket regexes encode production dims
(B=128, T=34, M=50, D=1024, F=4096, V→12416 padded); pass --dims to see and
adapt them for other configs.

Usage: python benchmarks/classify_train_trace.py <trace.xplane.pb> [steps]
  steps = how many train steps the trace spans (default 3, the
  profile_train_transformer.py capture) — per-step numbers divide by it.
"""

from __future__ import annotations

import collections
import re
import sys

# (category, regex) — FIRST match wins, so decoder-specific shapes must
# precede the generic encoder buckets.
BUCKETS = [
    ("dec: vocab head + CE", r"12416"),
    ("dec: MLP weight grads (+fused Adam)", r"\[(4096,1024|1024,4096)\]"),
    ("dec: MLP fwd/dgrad", r"128,34,4096"),
    ("dec: attn/proj matmuls (+fused Adam wgrads)",
     r"\[(1024,1024|1024,3072|3072,1024)\]"),
    ("dec: token-stream [B,T,D] fusions (LN/attn/residual)",
     r"128,34,(3072|1024)"),
    ("dec: attention probs/context", r"128,8,34|\[128,8,"),
    ("dec: cross-attn memory", r"128,(49|50),|\[50,"),
    ("dec: embed/proj weight grads",
     r"\[(256,1024|1024,256|12416,256|256,12416)\]"),
    ("dec: other [B,T] small", r"128,34"),
    ("enc: conv/BN activations", r"\[\d+,(112|56|28|14|7),|128,\d+,\d+,\d+\]"),
    ("enc: conv weight grads", r"\[(3,3|1,1),"),
    ("enc: BN stats/small-vec",
     r"convert_reduce_fusion|\[(16|24|32|96|144|192|384|576|960|1280)\]"),
    ("copies/collectives", r"copy|all-reduce"),
]


def load_op_durations(path: str) -> collections.Counter:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    dur = collections.Counter()
    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            # op-level lines only (see xplane_summary.py's double-count note)
            if not (
                line.name in ("XLA Ops", "Ops")
                or line.name.startswith("XLA Op")
            ):
                continue
            for ev in line.events:
                dur[ev_meta.get(ev.metadata_id, "?")] += ev.duration_ps
    return dur


def classify(op: str) -> str:
    for cat, pat in BUCKETS:
        if re.search(pat, op):
            return cat
    return "other"


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help", "--dims"):
        print(__doc__)
        if "--dims" in sys.argv:
            for cat, pat in BUCKETS:
                print(f"  {cat:<50} {pat}")
        return
    path = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    dur = load_op_durations(path)
    cats = collections.Counter()
    catops = collections.defaultdict(collections.Counter)
    total = 0
    for op, ps in dur.items():
        c = classify(op)
        cats[c] += ps
        catops[c][op] += ps
        total += ps

    print(
        f"total device: {total / 1e9:.2f} ms over {steps} steps = "
        f"{total / 1e9 / steps:.2f} ms/step"
    )
    print(f"{'category':<55}{'ms/step':>9} {'%':>6} {'ops':>6}")
    for c, ps in cats.most_common():
        print(
            f"{c:<55}{ps / 1e9 / steps:9.2f} {100 * ps / total:6.1f}"
            f" {len(catops[c]):6}"
        )
    print("\ntop ops per category:")
    for c, _ in cats.most_common():
        print(f"-- {c}")
        for op, ps in catops[c].most_common(4):
            print(f"   {ps / 1e9 / steps:7.3f} ms  {op[:110]}")


if __name__ == "__main__":
    main()
