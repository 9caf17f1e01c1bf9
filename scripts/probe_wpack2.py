#!/usr/bin/env python
"""Probe 2: backward decomposition for the w-packed conv (see probe_wpack).

probe_wpack measured fwd +22-24% but autodiff-backward -7..10%: the packed
conv's dgrad is an lhs-dilated conv (slow at b4, BASELINE.md). A custom-VJP
conv can mix-and-match:
  dx = conv3x3(g, rot(k)^T)  — itself a cout=cin conv -> w-packable
  dk = either plain wgrad or the packed conv's wgrad (full lanes, 1.33x MACs)
This script times each piece separately. Run: python scripts/probe_wpack2.py
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


def conv(x, k, strides=(1, 1), pad=((1, 1), (1, 1)), lhs_dil=None):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), strides, pad,
        lhs_dilation=lhs_dil, dimension_numbers=dn).astype(jnp.float32)


def pack2(k):
    kh, kw, cin, co = k.shape
    kp = jnp.zeros((kh, kw + 1, cin, 2 * co), k.dtype)
    kp = kp.at[:, 0:kw, :, 0:co].set(k)
    kp = kp.at[:, 1:kw + 1, :, co:].set(k)
    return kp


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    B, S = 4, 256

    for cin in ([64, 192] if len(sys.argv) < 2 else [64]):
        co = 64
        x = jnp.asarray(rng.normal(size=(B, S, S, cin)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(B, S, S, co)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, cin, co)).astype(np.float32) * 0.05)
        kT = jnp.transpose(k[::-1, ::-1], (0, 1, 3, 2))   # (3,3,co,cin)
        kTp = pack2(kT)                                    # (3,4,co,2cin)
        kp = pack2(k)
        g2 = g.reshape(B, S, S // 2, 2 * co)

        print(f"--- cin={cin} co={co}", flush=True)
        # dx formulations (result (B,S,S,cin)):
        t = chained_ms(lambda g: conv(g, kT), g)
        print(f"  dx plain-conv         {t:6.3f} ms", flush=True)
        if 2 * cin <= 128:
            t = chained_ms(
                lambda g: conv(g, kTp, strides=(1, 2)).reshape(
                    B, S, S // 2, 2, cin).reshape(B, S, S, cin), g)
            print(f"  dx packed-conv        {t:6.3f} ms", flush=True)

        # dk formulations (result (3,3,cin,co) / packed (3,4,cin,2co)):
        gk_plain = jax.grad(lambda k2, x2: jnp.sum(conv(x2, k2) * g), argnums=0)
        t = chained_ms(lambda x2: gk_plain(k, x2), x)
        print(f"  dk plain wgrad        {t:6.3f} ms", flush=True)
        gk_pack = jax.grad(
            lambda k2, x2: jnp.sum(conv(x2, k2, strides=(1, 2)) * g2),
            argnums=0)
        t = chained_ms(lambda x2: jnp.sum(gk_pack(kp, x2)), x)
        print(f"  dk packed wgrad       {t:6.3f} ms", flush=True)

        # reference: fwd both ways again (sanity vs probe 1)
        t = chained_ms(lambda x2: conv(x2, k), x)
        print(f"  fwd plain             {t:6.3f} ms", flush=True)
        t = chained_ms(lambda x2: conv(x2, kp, strides=(1, 2)), x)
        print(f"  fwd packed (no unpack){t:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
