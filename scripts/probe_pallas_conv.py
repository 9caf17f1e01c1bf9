#!/usr/bin/env python
"""Probe: Pallas pair-packed 3x3 conv vs XLA plain/packed (round 3).

The round-2 VERDICT's top ask: attempt a custom Pallas conv for the
narrow-cout (cout=64) generator rows, or reject it with kernel-level
measurements. This times the forward at the b4 row-0 shapes and reports
achieved TFLOP/s (useful conv FLOPs / wall) for each formulation.

Run on the real chip: python scripts/probe_pallas_conv.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def chained_ms(op, x, *rest, iters=40):
    @jax.jit
    def run(x, n):
        def body(i, c):
            scale = 1.0 + 1e-6 * i.astype(jnp.float32)
            o = op(x * scale, *rest)
            return c + jnp.sum(o.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(x, 2))
    t0 = time.perf_counter(); float(run(x, 12 + iters)); t_l = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(x, 12)); t_s = time.perf_counter() - t0
    return max(1e-9, (t_l - t_s) / iters * 1e3)


def conv_plain(x, k):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=dn).astype(jnp.float32)


def conv_packed_xla(x, k):
    from tactile_gan_tpu.ops.conv import _conv_packed_plain, _unpack2_w
    return _unpack2_w(_conv_packed_plain(x, k, jnp.bfloat16), k.shape[3])


def conv_pallas(x, k):
    from tactile_gan_tpu.ops.pallas.conv3x3 import conv3x3_p1
    return conv3x3_p1(x, k)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    B, S = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (4, 256)

    for cin, co in [(64, 64), (32, 64), (64, 32)]:
        x = jnp.asarray(rng.normal(size=(B, S, S, cin)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, cin, co)).astype(np.float32) * 0.05)
        gflop = 2 * 9 * cin * co * B * S * S / 1e9

        a = jax.jit(conv_plain)(x, k)
        c = jax.jit(conv_pallas)(x, k)
        err = float(jnp.max(jnp.abs(a - c)))
        scale = float(jnp.max(jnp.abs(a)))
        print(f"cin={cin} co={co} (B{B} {S}^2): pallas rel err "
              f"{err / scale:.2e}", flush=True)

        for name, fn in (("xla plain ", conv_plain),
                         ("xla packed", conv_packed_xla),
                         ("pallas    ", conv_pallas)):
            t = chained_ms(fn, x, k)
            print(f"  {name}: {t:7.3f} ms  {gflop / t:7.1f} TFLOP/s",
                  flush=True)


if __name__ == "__main__":
    main()
