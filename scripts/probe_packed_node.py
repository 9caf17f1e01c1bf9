#!/usr/bin/env python
"""Probe: a full UNet++ row-0 node in the packed layout vs XLA (round 3).

The packed Pallas conv (conv3x3_packed) beats XLA 2.3x when its input AND
output stay packed. The realistic unit is a node: conv -> instance norm ->
leaky relu -> conv -> instance norm -> leaky relu. In packed space the
norm's stats are a lane reduction + a C-fold (no unpack): this measures the
whole chain fwd and fwd+bwd (bwd = XLA plain formulation via custom VJP,
like lane_pack) against the XLA-on-NHWC equivalent.

Run on the real chip: python scripts/probe_packed_node.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tactile_gan_tpu.ops.pallas.conv3x3 import conv3x3_packed, pack_w, unpack_w


def chained_ms(fn, *args, iters=30):
    @jax.jit
    def run(x, n):
        def body(i, c):
            o = fn(x + i.astype(jnp.float32) * 1e-9, *args[1:])
            return c + jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    x = args[0]
    float(run(x, 2))
    t0 = time.perf_counter(); float(run(x, 8 + iters)); tl = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(x, 8)); ts = time.perf_counter() - t0
    return max(1e-9, (tl - ts) / iters * 1e3)


def conv_xla(x, k):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=dn).astype(jnp.float32)


def in_lrelu_nhwc(y, gamma, beta):
    mean = y.mean(axis=(1, 2), keepdims=True)
    var = y.var(axis=(1, 2), keepdims=True)
    z = (y - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
    return jnp.where(z >= 0, z, 0.2 * z)


def in_lrelu_packed(yp, gamma, beta):
    """Instance norm + leaky relu on (N, HP, 2C) without unpacking: lane
    sums fold the two w-phases (lanes ci and ci+C are the same channel)."""
    n, hp, c2 = yp.shape
    c = c2 // 2
    s1 = jnp.sum(yp, axis=1)
    s2 = jnp.sum(yp * yp, axis=1)
    cnt = 2.0 * hp
    mean = (s1[:, :c] + s1[:, c:]) / cnt
    var = (s2[:, :c] + s2[:, c:]) / cnt - mean * mean
    scale = jax.lax.rsqrt(var + 1e-5) * gamma
    shift = beta - mean * scale
    scale2 = jnp.tile(scale, (1, 2))[:, None, :]
    shift2 = jnp.tile(shift, (1, 2))[:, None, :]
    z = yp * scale2 + shift2
    return jnp.where(z >= 0, z, 0.2 * z)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    B, S, C = 4, 256, 64
    x = jnp.asarray(rng.normal(size=(B, S, S, C)).astype(np.float32))
    k1 = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05)
    k2 = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05)
    g1 = jnp.ones((C,), jnp.float32); b1 = jnp.zeros((C,), jnp.float32)
    g2 = jnp.ones((C,), jnp.float32); b2 = jnp.zeros((C,), jnp.float32)

    def node_xla(x, k1, k2):
        y = in_lrelu_nhwc(conv_xla(x, k1), g1, b1)
        return in_lrelu_nhwc(conv_xla(y, k2), g2, b2)

    def node_packed(xp, k1, k2):
        y = in_lrelu_packed(conv3x3_packed(xp, k1, h=S), g1, b1)
        return in_lrelu_packed(conv3x3_packed(y, k2, h=S), g2, b2)

    xp = pack_w(x)
    a = jax.jit(node_xla)(x, k1, k2)
    b = unpack_w(jax.jit(node_packed)(xp, k1, k2), S, C)
    err = float(jnp.max(jnp.abs(a - b))) / float(jnp.max(jnp.abs(a)))
    print(f"node rel err: {err:.2e}", flush=True)

    t = chained_ms(node_xla, x, k1, k2)
    print(f"fwd  xla nhwc    : {t:7.3f} ms", flush=True)
    t = chained_ms(node_packed, xp, k1, k2)
    print(f"fwd  packed      : {t:7.3f} ms", flush=True)

    # fwd+bwd: packed fwd with XLA-plain bwd via custom VJP (the lane_pack
    # pattern: the two formulations are the same function).
    def mk_vjp(packed_fwd, plain_fwd):
        @jax.custom_vjp
        def f(x, k1, k2):
            return packed_fwd(x, k1, k2)
        def fwd(x, k1, k2):
            return packed_fwd(x, k1, k2), (x, k1, k2)
        def bwd(res, gp):
            xp_, k1_, k2_ = res
            x_ = unpack_w(xp_, S, C)
            _, pull = jax.vjp(plain_fwd, x_, k1_, k2_)
            dx, dk1, dk2 = pull(unpack_w(gp, S, C))
            return pack_w(dx), dk1, dk2
        f.defvjp(fwd, bwd)
        return f

    node_packed_vjp = mk_vjp(node_packed, node_xla)

    def loss_xla(x, k1, k2):
        return jnp.sum(node_xla(x, k1, k2) ** 2)

    def loss_packed(xp, k1, k2):
        return jnp.sum(node_packed_vjp(xp, k1, k2) ** 2)

    gx = jax.grad(loss_xla, argnums=(0, 1, 2))
    gp = jax.grad(loss_packed, argnums=(0, 1, 2))
    t = chained_ms(lambda x, k1, k2: gx(x, k1, k2)[0], x, k1, k2)
    print(f"grad xla nhwc    : {t:7.3f} ms", flush=True)
    t = chained_ms(lambda xp, k1, k2: gp(xp, k1, k2)[0], xp, k1, k2)
    print(f"grad packed(vjp) : {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
