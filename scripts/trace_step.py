#!/usr/bin/env python
"""Trace the b4 train step and break device time down by opcode.

Recipe (round-2 BASELINE.md): trace a few steps via jax.profiler.trace,
parse the dumped vm.xplane.pb with tensorflow's xplane proto, group the
device "XLA Ops" line's events by RESULT opcode (operand-substring matching
wildly misattributes). Run on the real chip:

    python scripts/trace_step.py [out_dir]
"""

import glob
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def trace(out_dir):
    import jax
    from probe_packed_step import build_step, time_step

    print("backend:", jax.default_backend(), flush=True)
    state, step = build_step(4, True, None)  # shipped auto gates
    ips = time_step(state, step, 4, steps=10)
    print(f"step rate before trace: {ips:.2f} img/s", flush=True)

    import jax.numpy as jnp
    import numpy as np
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 255, (4, 256, 256, 3), dtype=np.uint8))
    tgt = jnp.asarray(rng.integers(0, 255, (4, 256, 256, 3), dtype=np.uint8))
    key = jax.random.key(1)
    with jax.profiler.trace(out_dir):
        for _ in range(3):
            state, m = step(state, src, tgt, key, apply_gp=True)
        float(m.loss_d)


def parse(out_dir, n_steps=3):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {out_dir}"
    xs = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        buckets = defaultdict(float)
        total = 0.0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                total += dur
                # result opcode: the hlo op name prefix before '.' digits
                op = re.split(r"[.\d]", name, 1)[0]
                if "fusion" in name:
                    op = "fusion"
                buckets[op] += dur
        if total:
            print(f"plane {plane.name}: {total / n_steps:.2f} ms/step device")
            for op, ms in sorted(buckets.items(), key=lambda t: -t[1])[:18]:
                print(f"  {op:35s} {ms / n_steps:7.2f} ms")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else f"/tmp/trace_{os.getpid()}"
    trace(out)
    time.sleep(2)
    parse(out)
