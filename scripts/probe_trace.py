#!/usr/bin/env python
"""Trace-observability repro for the both-Mosaic-families INVALID_ARGUMENT
(VERDICT r3 item 6): the round-3 profiler rejected any program containing
BOTH the batch-lane norm kernels and the packed conv kernel through the axon
relay, so the shipped b4 default was optimized via proxy breakdowns.

This probe isolates it: traces (a) a norm-kernel-only program, (b) a
packed-conv-only program, (c) a minimal program with both, (d) the full b4
default step — and tries distinct pallas_call names as a workaround knob.

Usage: python scripts/probe_trace.py [outdir]
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def try_trace(name, fn, outroot):
    d = os.path.join(outroot, name)
    os.makedirs(d, exist_ok=True)
    r = fn()  # compile outside the trace
    float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    try:
        with jax.profiler.trace(d):
            for _ in range(3):
                r = fn()
            float(jnp.sum(r[0] if isinstance(r, tuple) else r))
        files = glob.glob(os.path.join(d, "**", "*.xplane.pb"),
                          recursive=True)
        print(f"{name}: TRACED OK -> {files}", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAILED: {type(e).__name__}: {e}", flush=True)
        return False


def main():
    outroot = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_trace"
    from tactile_gan_tpu.ops.pallas.conv3x3 import conv3x3_packed
    from tactile_gan_tpu.ops.pallas.instance_norm import instance_norm_act

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 64, 64, 64)).astype(np.float32))
    xp = jnp.asarray(rng.normal(size=(4, 64 * 32, 128)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * .02)
    sc = jnp.ones((64,), jnp.float32)
    off = jnp.zeros((64,), jnp.float32)

    norm_only = jax.jit(lambda a: instance_norm_act(a, sc, off, act="relu"))
    conv_only = jax.jit(lambda a: conv3x3_packed(a, k, h=64))

    @jax.jit
    def both(a, b):
        y = instance_norm_act(a, sc, off, act="relu")
        z = conv3x3_packed(b, k, h=64)
        return jnp.sum(y) + jnp.sum(z)

    try_trace("norm_only", lambda: norm_only(x), outroot)
    try_trace("conv_only", lambda: conv_only(xp), outroot)
    ok = try_trace("both_minimal", lambda: both(x, xp), outroot)

    if not ok:
        print("minimal repro CONFIRMED: two Mosaic families in one traced "
              "program fail through the relay", flush=True)

    # Full default b4 step (norm kernels + packed conv + packed up-conv).
    from probe_disc import build, SIZE
    _, state, step = build(4)
    src = jnp.asarray(rng.integers(0, 255, (4, SIZE, SIZE, 3),
                                   dtype=np.uint8))
    tgt = jnp.asarray(rng.integers(0, 255, (4, SIZE, SIZE, 3),
                                   dtype=np.uint8))
    key = jax.random.key(1)
    state, m = step(state, src, tgt, key, apply_gp=True)
    float(m.loss_d)

    holder = {"state": state}

    def run_step():
        holder["state"], mm = step(holder["state"], src, tgt, key,
                                   apply_gp=True)
        return mm.loss_d

    try_trace("full_b4_default", run_step, outroot)


if __name__ == "__main__":
    main()
