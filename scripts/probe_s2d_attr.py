#!/usr/bin/env python
"""Attribute the s2d-vs-packed residual (VERDICT r3 item 7).

Round 3: b4 s2d 83.8 img/s vs faithful+packed 74.5 (+12.5%). Hypothesis:
the gap is exactly the packing overhead of the FAITHFUL row-0 arithmetic —
the packed kernel spends 12 MXU taps per output for 9 useful (the Blr
cross-pair operand is half-dense), and the packed up-conv 6 taps vs the
s2d direct-concat piece's 9-tap conv at HALF the input width (= 4.5-tap
equivalent). Both forms run dense 128-lane tiles, so if the per-node ms
ratio matches the 4/3 MAC ratio, the residual is irreducible without
changing the network (s2d changes receptive fields; packed is exact).

Chained timing (relay dispatch amortized): per-node forward ms of
  packed node conv   — conv3x3_packed, b4 256^2 C=Co=64 (12 taps)
  s2d node conv      — plain conv2d 128->128 @128^2 (9 taps, same useful)
  packed up piece    — conv3x3_on_up2_packed 128ch coarse (6 taps)
  s2d up piece       — plain conv2d 128->128 @128^2 (the direct concat)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chained_ms(op, x, *rest, iters=40):
    @jax.jit
    def run(x, n):
        def body(i, c):
            scale = 1.0 + 1e-6 * i.astype(jnp.float32)
            o = op(x * scale, *rest)
            return c + jnp.sum(o.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(x, 2))
    t0 = time.perf_counter()
    float(run(x, 10 + iters))
    t_long = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(x, 10))
    t_short = time.perf_counter() - t0
    return max(0.0, (t_long - t_short) / iters * 1e3)


def main():
    from tactile_gan_tpu.ops.conv import conv2d
    from tactile_gan_tpu.ops.packed_row import conv3x3_on_up2_packed
    from tactile_gan_tpu.ops.pallas.conv3x3 import conv3x3_packed

    rng = np.random.default_rng(0)
    useful = 2 * 4 * 256 * 256 * 9 * 64 * 64  # the faithful node conv FLOPs

    xp = jnp.asarray(rng.normal(size=(4, 256 * 128, 128)).astype(np.float32))
    k64 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * .02)
    ms = chained_ms(lambda a, k: conv3x3_packed(a, k, h=256,
                                                compute_dtype=jnp.bfloat16),
                    xp, k64)
    print(f"packed node conv (12 taps): {ms:.3f} ms "
          f"({useful/ms*1e3/1e12:.1f} TFLOP/s useful)", flush=True)

    xs = jnp.asarray(rng.normal(size=(4, 128, 128, 128)).astype(np.float32))
    k128 = jnp.asarray(
        rng.normal(size=(3, 3, 128, 128)).astype(np.float32) * .02)
    ms2 = chained_ms(lambda a, k: conv2d(a, k, padding=1,
                                         compute_dtype=jnp.bfloat16),
                     xs, k128)
    print(f"s2d node conv (9 taps, same useful FLOPs): {ms2:.3f} ms "
          f"({useful/ms2*1e3/1e12:.1f} TFLOP/s)", flush=True)
    print(f"node ratio packed/s2d = {ms/max(ms2,1e-9):.3f} "
          f"(MAC ratio 12/9 = 1.333)", flush=True)

    xc = jnp.asarray(rng.normal(size=(4, 128, 128, 128)).astype(np.float32))
    k12864 = jnp.asarray(
        rng.normal(size=(3, 3, 128, 64)).astype(np.float32) * .02)
    ms3 = chained_ms(lambda a, k: conv3x3_on_up2_packed(
        a, k, compute_dtype=jnp.bfloat16), xc, k12864)
    up_useful = 2 * 4 * 256 * 256 * 9 * 128 * 64  # materialized-form FLOPs
    print(f"packed up piece (6 taps/fine out): {ms3:.3f} ms "
          f"({up_useful/ms3*1e3/1e12:.1f} TFLOP/s on materialized-form "
          f"FLOPs)", flush=True)
    # s2d's boundary piece is the 128->128 @128^2 conv already timed (ms2):
    # row 1 concats directly, no upsample. Per-information comparison:
    print(f"up ratio packed/s2d-direct = {ms3/max(ms2,1e-9):.3f} "
          f"(MAC ratio 6/4.5 = 1.333)", flush=True)


if __name__ == "__main__":
    main()
