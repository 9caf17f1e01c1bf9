#!/usr/bin/env python
"""Probe: bf16-resident DEEP rows (round 3).

The packed row 0 going bf16-resident won +21% (BASELINE.md). Rows 1-4
(C = 128..1024) have dense NHWC bf16 tiles too — round 1's "bf16
activations 12% slower" verdict was driven by the then-unpacked narrow
row 0. This flips ops.conv.RESIDENT_COMPUTE_DTYPE and measures the full
step. XLA norms only (the Pallas norm kernels take f32 input).

Run on the real chip: python scripts/probe_deep_bf16.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from tactile_gan_tpu.ops import conv as conv_mod
from probe_packed_step import build_step, time_step


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    conv_mod.RESIDENT_COMPUTE_DTYPE = True
    for batch, pallas in [(4, False), (16, False)]:
        t0 = time.perf_counter()
        state, step = build_step(batch, pallas, None)
        ips = time_step(state, step, batch)
        print(f"b{batch}_xla_deepbf16: {ips:.2f} img/s "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
