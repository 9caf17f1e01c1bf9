#!/usr/bin/env python
"""Round-5 packed-wgrad kernel evidence.

1. A/B of the full b4 default step: dk via the in-VMEM Pallas wgrad kernel
   vs the materialized-shifted-view XLA einsums (TACTILE_WGRAD=xla), same
   process, same data.
2. Packed-gate re-check: the packed row was gated to per-chip batch <= 4 in
   round 3 when its backward still paid the 12.1 ms view materializations —
   with the wgrad kernel the crossover may move, so force packed+pallas at
   b8/b16 and compare against the shipped XLA-path numbers (b8 100.2 /
   b16 104.4, round 4).

Usage (on the chip): python scripts/probe_wgrad.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    import bench
    from probe_disc import build, time_step

    print("backend:", jax.default_backend(), flush=True)

    for mode in ("xla", "kernel"):
        if mode == "xla":
            os.environ["TACTILE_WGRAD"] = "xla"
        else:
            os.environ.pop("TACTILE_WGRAD", None)
        _, state, step = build(4)
        ips = time_step(step, state, 4)
        print(f"b4 default step, wgrad={mode}: {ips:.2f} img/s", flush=True)

    os.environ.pop("TACTILE_WGRAD", None)
    for b in (8, 16):
        try:
            _, _, st, sp = bench._build_step(b, True, packed_row0=True)
            ips, _ = bench._time_step(sp, st, b, 12)
            print(f"b{b} packed+pallas FORCED: {ips:.2f} img/s "
                  f"(shipped XLA path r4: {'100.2' if b == 8 else '104.4'})",
                  flush=True)
        except Exception as e:
            print(f"b{b} packed forced failed: {type(e).__name__}: "
                  f"{str(e).splitlines()[-1][:200]}", flush=True)


if __name__ == "__main__":
    main()
