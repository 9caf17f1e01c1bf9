#!/usr/bin/env python
"""Probe: w-packed convs for the half-empty-lane rows (round-3 frontier).

At nf=64 the UNet++ row-0 convs produce cout=64 — only half the MXU's 128
output lanes do useful work (BASELINE.md round-2 xplane analysis; the
--space_to_depth variant proves +44% is available by changing the network).

The w-pack rewrite fills the lanes WITHOUT changing the network: two
horizontally adjacent outputs y[..., 2w', :] and y[..., 2w'+1, :] are
computed by ONE stride-(1,2) conv whose (3,4,cin,128) kernel embeds the
3x3 kernel twice at w-offsets 0 and 1 into disjoint cout halves — the extra
taps multiply exact zeros, so numerics are identical; the packed output
(N,H,W/2,128) reshapes (no transpose: the (w-pair, phase) axes are adjacent)
back to (N,H,W,64). Useful-MAC fraction 9/12 = 75%, vs 50% lane occupancy.

Measures fwd and fwd+grads, plain vs packed, for the row-0 shapes, bf16,
chained-loop timing (the axon relay's ~2.4 ms dispatch floor cancels).
Run on the real chip: python scripts/probe_wpack.py
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
    return max(0.0, (t_l - t_s) / iters * 1e3)


def conv_plain(x, k):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=dn).astype(jnp.float32)


def pack_kernel(k):
    """(3,3,cin,co) -> (3,4,cin,2*co): k at w-offsets 0 (even) and 1 (odd)."""
    kh, kw, cin, co = k.shape
    kp = jnp.zeros((kh, kw + 1, cin, 2 * co), k.dtype)
    kp = kp.at[:, 0:kw, :, 0:co].set(k)
    kp = kp.at[:, 1:kw + 1, :, co:2 * co].set(k)
    return kp


def conv_packed(x, kp, co):
    n, h, w, cin = x.shape
    dn = lax.conv_dimension_numbers((n, h, w, cin), kp.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), kp.astype(jnp.bfloat16), (1, 2),
        ((1, 1), (1, 1)), dimension_numbers=dn).astype(jnp.float32)
    return y.reshape(n, h, w // 2, 2, co).reshape(n, h, w, co)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    B, S = 4, 256

    shapes = [(64, 64), (192, 64)]
    if len(sys.argv) > 1 and sys.argv[1] == "full":
        shapes = [(64, 64), (3, 64), (128, 64), (192, 64), (320, 64)]
    for cin, co in shapes:
        x = jnp.asarray(rng.normal(size=(B, S, S, cin)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, cin, co)).astype(np.float32) * 0.05)
        kp = pack_kernel(k)

        a = jax.jit(conv_plain)(x, k)
        b = jax.jit(lambda x, kp: conv_packed(x, kp, co))(x, kp)
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"cin={cin:4d} co={co}: err={err:.2e}", flush=True)

        t_f0 = chained_ms(conv_plain, x, k)
        print(f"  fwd plain  {t_f0:6.3f} ms", flush=True)
        t_f1 = chained_ms(lambda x, kp: conv_packed(x, kp, co), x, kp)
        print(f"  fwd packed {t_f1:6.3f} ms", flush=True)

        def loss_plain(x2, k2):
            return jnp.sum(conv_plain(x2, k2) ** 2)

        def loss_pack(x2, k2):
            return jnp.sum(conv_packed(x2, pack_kernel(k2), co) ** 2)

        gp = jax.grad(loss_plain, argnums=(0, 1))
        gq = jax.grad(loss_pack, argnums=(0, 1))
        t_b0 = chained_ms(lambda x2, k2: gp(x2, k2)[0] + 0.0 * jnp.sum(gp(x2, k2)[1]), x, k)
        print(f"  grad plain  {t_b0:6.3f} ms", flush=True)
        t_b1 = chained_ms(lambda x2, k2: gq(x2, k2)[0] + 0.0 * jnp.sum(gq(x2, k2)[1]), x, k)
        print(f"  grad packed {t_b1:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
