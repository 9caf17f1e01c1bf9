#!/usr/bin/env python
"""Parse a jax.profiler xplane trace: group device-side op time by opcode.

The round-2/3 analyses used this recipe (the original /tmp scripts were
lost; CLAUDE.md records it): read vm.xplane.pb with
tensorflow.tsl.profiler.protobuf.xplane_pb2, walk the device plane's
"XLA Ops" line, and attribute each event to its RESULT opcode (substring
matching on operands wildly misattributes).

Usage: python scripts/parse_xplane.py <trace_dir_or_pb> [top_n]
"""

import glob
import os
import sys
from collections import defaultdict


def find_pb(path):
    if path.endswith(".pb"):
        return path
    hits = glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
    if not hits:
        raise FileNotFoundError(f"no *.xplane.pb under {path}")
    return sorted(hits)[-1]


def classify(name: str) -> str:
    """Bucket an XLA op name by its result opcode."""
    base = name.split("/")[-1]
    # strip trailing .N / digits
    for tok in ("fusion", "custom-call", "convolution", "copy", "reshape",
                "transpose", "reduce-window", "reduce", "gather", "scatter",
                "dot", "dynamic-slice", "dynamic-update-slice", "select",
                "concatenate", "broadcast", "iota", "bitcast", "convert",
                "slice", "pad", "all-reduce", "rng"):
        if base.startswith(tok):
            return tok
    return base.split(".")[0]


def main():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pb = find_pb(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    space = xplane_pb2.XSpace()
    with open(pb, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            by_op = defaultdict(float)
            by_name = defaultdict(float)
            total = 0.0
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                ms = ev.duration_ps / 1e9
                by_op[classify(meta.name)] += ms
                by_name[meta.name] += ms
                total += ms
            print(f"== plane '{plane.name}' line '{line.name}': "
                  f"{total:.2f} ms total device op time ==")
            for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:top_n]:
                print(f"  {k:<24} {v:9.3f} ms  ({v/total*100:4.1f}%)")
            print("-- top individual ops --")
            for k, v in sorted(by_name.items(),
                               key=lambda kv: -kv[1])[:top_n]:
                print(f"  {v:9.3f} ms  {k[:110]}")


if __name__ == "__main__":
    main()
