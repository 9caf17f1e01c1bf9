#!/usr/bin/env python
"""Decompose the b4 default step's "fusion" trace bucket (VERDICT r4 item 4).

The round-4 trace of the shipped b4 step stopped at bucket level (51.4 ms =
fusions 21.0 + copies 6.9 + ...). This probe names what is INSIDE: through
the axon relay the compiled HLO carries no op_name metadata, but the xplane
event names embed the FULL HLO instruction text — parameter names
(state_g_params__params__node4_0__..., block4_conv), kernel names
(conv3x3_packed), and operand shapes (D activations are [N,127|63|61|59|57,..]
or the transposed [H,32,8,C] form; packed row 0 is [4,32768,128]) — enough to
bucket every event by subsystem.

Usage (on the chip): python scripts/probe_fusion_attr.py [batch] [outdir]
"""

import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def xplane_events(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    hits = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                     recursive=True)
    space = xplane_pb2.XSpace()
    with open(sorted(hits)[-1], "rb") as f:
        space.ParseFromString(f.read())
    by_name = defaultdict(float)
    for plane in space.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                by_name[meta.name] += ev.duration_ps / 1e9
    return by_name


# D activations: NHWC (any batch) at the valid-pad rows, or XLA's
# transposed (H, Wtiles, N, C) layout for the same rows.
_D_SHAPE = re.compile(r"\[\d+,(?:127|63|61|59|57),")
_D_SHAPE_T = re.compile(r"\[(?:127|63|61|59|57),\d+,\d+,")
_D_NAME = re.compile(r"block\d_(?:conv|norm)|patch_head|state_d_")
_PACKED_ROW = re.compile(r"\[4,32768,(?:128|6)\]|\[4,(?:128|256),2,128")
_NODE = re.compile(r"node(\d)_\d")
_G_OPT = re.compile(r"state_g_opt_state")
_UP = re.compile(r"up_?(\d)|up(\d)_")


def classify(text: str) -> str:
    head = text.split("=", 1)[0]
    if head.strip().lstrip("%").startswith("conv3x3_packed"):
        return "row0 packed conv kernel"
    if _D_NAME.search(text) or _D_SHAPE.search(text) or \
            _D_SHAPE_T.search(text):
        return "D + GP"
    opcode = ""
    m = re.search(r"=\s*(?:\([^)]*\)|\S+)\s+([\w\-]+)\(", text)
    if m:
        opcode = m.group(1)
    nodes = [int(g) for g in _NODE.findall(text)]
    if _PACKED_ROW.search(text):
        if "custom-call" in opcode:
            return "row0 norm kernel"
        return "row0 packed glue (fusions/pad/select)"
    if nodes:
        row = min(nodes)
        tag = f"G row{row}"
        if _G_OPT.search(text):
            return tag + " wgrad+adam"
        return tag + " conv/fusion"
    if opcode in ("copy", "reshape", "bitcast", "transpose"):
        return f"layout {opcode}"
    if "custom-call" in opcode or head.strip().lstrip("%").startswith(
            ("custom-call",)):
        return "custom-call (norm kernels)"
    if _G_OPT.search(text) or "state_g_params" in text:
        return "G misc (opt/param)"
    return f"other {opcode or '?'}"


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fusion_attr"
    os.makedirs(outdir, exist_ok=True)

    from probe_disc import SIZE, build
    _, state, step = build(batch)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 255, (batch, SIZE, SIZE, 3),
                                   dtype=np.uint8))
    tgt = jnp.asarray(rng.integers(0, 255, (batch, SIZE, SIZE, 3),
                                   dtype=np.uint8))
    key = jax.random.key(1)

    state, m = step(state, src, tgt, key, apply_gp=True)
    float(m.loss_d)
    holder = {"s": state}
    with jax.profiler.trace(outdir):
        for _ in range(3):
            holder["s"], mm = step(holder["s"], src, tgt, key, apply_gp=True)
        float(mm.loss_d)

    by_name = xplane_events(outdir)
    total = sum(by_name.values())
    print(f"device total {total:.2f} ms over 3 steps "
          f"({total / 3:.2f} ms/step)\n", flush=True)

    buckets = defaultdict(float)
    examples = defaultdict(list)
    for name, ms in by_name.items():
        b = classify(name)
        buckets[b] += ms
        examples[b].append((ms, name))

    print("== per-subsystem buckets (ms per step) ==")
    for b, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{ms / 3:8.3f} ms  {b}")
    print("\n== top 3 ops inside each bucket ==")
    for b, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"-- {b} ({ms / 3:.3f} ms/step)")
        for ems, name in sorted(examples[b], reverse=True)[:3]:
            print(f"   {ems / 3:7.3f} ms  {name[:150]}")


if __name__ == "__main__":
    main()
