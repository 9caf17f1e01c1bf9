#!/usr/bin/env python
"""Decompose the b4 default step's "fusion" trace bucket (VERDICT r4 item 4).

The round-4 trace of the shipped b4 step stopped at bucket level (51.4 ms =
fusions 21.0 + copies 6.9 + ...). This probe names what is INSIDE the 21 ms:
it traces 3 steps, takes per-HLO-op durations from the xplane, then maps each
op back to its HLO metadata op_name (the jax name stack, which carries the
flax module path — UNet++ row/node names — and the autodiff direction via
transpose(...) scopes), plus the convolution ops inside each fused
computation.

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


def xplane_by_name(trace_dir):
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


_INSTR = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*\S+\s+(\w[\w\-]*)\(.*?"
    r"(?:metadata=\{[^}]*op_name=\"([^\"]*)\")?", re.S)


def parse_hlo(hlo_text):
    """instruction name -> (opcode, op_name metadata, computation name);
    computation name -> list of (opcode, op_name) for interesting inner ops."""
    instr = {}
    comp_ops = defaultdict(list)
    comp = None
    fusion_calls = {}
    for ln in hlo_text.splitlines():
        m = re.match(r"^(%?[\w.\-]+)\s+\([^)]*\)\s*->", ln.strip())
        if not ln.startswith(" ") and ("{" in ln) and ("=" not in ln):
            cm = re.match(r"^\s*(?:ENTRY\s+)?%?([\w.\-]+)", ln)
            comp = cm.group(1) if cm else comp
            continue
        mm = _INSTR.match(ln)
        if not mm:
            continue
        name, opcode, op_name = mm.group(1), mm.group(2), mm.group(3) or ""
        instr[name] = (opcode, op_name, comp)
        cm = re.search(r"(?:calls|fusion)=%?([\w.\-]+)", ln)
        if opcode == "fusion" and cm:
            fusion_calls[name] = cm.group(1)
        if opcode in ("convolution", "dot", "custom-call", "reduce",
                      "scatter", "gather"):
            comp_ops[comp].append((opcode, op_name))
    return instr, comp_ops, fusion_calls


def shorten(op_name):
    """Compress a jax op_name stack to its informative tail: autodiff
    direction + flax module scopes + primitive."""
    if not op_name:
        return "(no metadata)"
    parts = op_name.split("/")
    keep = []
    for p in parts:
        if p.startswith("jit(") or p == "jvp(step)":
            continue
        keep.append(p)
    return "/".join(keep[-6:])


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

    lowered = step.lower(state, src, tgt, key, apply_gp=True)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    with open(os.path.join(outdir, "compiled.hlo.txt"), "w") as f:
        f.write(hlo)
    instr, comp_ops, fusion_calls = parse_hlo(hlo)
    print(f"parsed {len(instr)} instructions, "
          f"{len(fusion_calls)} fusions with calls", flush=True)

    state, m = step(state, src, tgt, key, apply_gp=True)
    float(m.loss_d)
    holder = {"s": state}
    with jax.profiler.trace(outdir):
        for _ in range(3):
            holder["s"], mm = step(holder["s"], src, tgt, key, apply_gp=True)
        float(mm.loss_d)

    by_name = xplane_by_name(outdir)
    total = sum(by_name.values())
    print(f"device total {total:.2f} ms over 3 steps "
          f"({total / 3:.2f} ms/step)\n", flush=True)

    # Attribute every op: group by shortened op_name of the op itself; for
    # fusions, also show the convs/dots inside the fused computation.
    rows = []
    for name, ms in by_name.items():
        opcode, op_name, _ = instr.get(name, ("?", "", None))
        inner = ""
        if name in fusion_calls:
            inside = comp_ops.get(fusion_calls[name], [])
            if inside:
                inner = " | inner: " + "; ".join(
                    f"{oc}:{shorten(on)}" for oc, on in inside[:3])
        rows.append((ms, name, opcode, shorten(op_name), inner))
    rows.sort(reverse=True)

    print("== top 40 individual ops (3-step totals) ==")
    for ms, name, opcode, s_on, inner in rows[:40]:
        print(f"{ms:8.3f} ms  {name:<22} {opcode:<12} {s_on}{inner}")

    # Aggregate per module-scope key (2nd-to-last path component usually the
    # flax scope) and per direction.
    agg = defaultdict(float)
    for ms, name, opcode, s_on, inner in rows:
        direction = "bwd" if "transpose(" in s_on else "fwd"
        scope = s_on.split("/")[0] if "/" in s_on else s_on
        agg[(direction, scope, opcode)] += ms
    print("\n== aggregated (direction, leading scope, opcode) ==")
    for (d, sc, oc), ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms:8.3f} ms  {d:<4} {oc:<12} {sc}")


if __name__ == "__main__":
    main()
