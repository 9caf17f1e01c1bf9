#!/usr/bin/env python
"""D-side ceiling probe (VERDICT r4 item 5).

The PatchDiscriminator's valid-pad chain produces odd spatial rows
(127/63/61/59/57 — models/patch_discriminator.py:8) which block w-pair
packing; round 4 measured-and-rejected the SAME-pad variant (+18% FLOPs).
The remaining unstated question: would an EXACT pad-to-even-then-mask form
(conv1 padded (0,1) -> 128 rows, junk rows masked out of IN stats and the
patch loss; the stride-2 conv2 provably never reads the junk row) leave any
headroom?

This probe bounds that headroom from above by timing the isolated
D-update program (batched fake+real forward + mixed-GP second order + grad
wrt params — the same work train/step.py does per step) over three
geometries with IDENTICAL parameter shapes:

  valid   127/63/61/59/57   the shipped faithful chain
  even    128/64/62/60/58   what pad-to-even-then-mask would run (shape
                            cost only — values not masked here; the exact
                            form can only be SLOWER than this, it adds the
                            mask arithmetic)
  pow2    128/64/64/64/64   the r4 same_pad geometry (known -1.2..-3.4%)

If `even` is not measurably faster than `valid`, the exact masked form
cannot win and the D is at its shape ceiling.

Usage (on the chip): python scripts/probe_disc_ceiling.py [batch ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

NF = 64
SIZE = 256


def make_params(key):
    ks = jax.random.split(key, 6)
    widths = [(6, NF), (NF, 2 * NF), (2 * NF, 4 * NF), (4 * NF, 8 * NF),
              (8 * NF, 1)]
    params = []
    for k, (ci, co) in zip(ks, widths):
        params.append({
            "w": jax.random.normal(k, (3, 3, ci, co), jnp.float32) * 0.02,
            "b": jnp.zeros((co,), jnp.float32),
            "scale": jnp.ones((co,), jnp.float32),
            "offset": jnp.zeros((co,), jnp.float32),
        })
    return params


def conv(x, p, stride, pad):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), p["w"].astype(jnp.bfloat16),
        (stride, stride), [(pad[0], pad[1]), (pad[0], pad[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"].astype(y.dtype)


def instance_norm(x, p):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 2), keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    return (y * p["scale"] + p["offset"]).astype(x.dtype)


def d_forward(params, a, b, pads):
    x = jnp.concatenate([a, b], axis=-1)
    x = jax.nn.leaky_relu(conv(x, params[0], 2, pads[0]), 0.2)
    for i, stride in ((1, 2), (2, 1), (3, 1)):
        x = conv(x, params[i], stride, pads[i])
        x = jax.nn.leaky_relu(instance_norm(x, params[i]), 0.2)
    return conv(x, params[4], 1, pads[4]).astype(jnp.float32)


def d_update(params, a, real, fake, eps, pads):
    def loss_fn(p):
        both = d_forward(p, jnp.concatenate([a, a]),
                         jnp.concatenate([fake, real]), pads)
        pf, pr = jnp.split(both, 2)
        loss = (jnp.mean(jnp.square(pf)) +
                jnp.mean(jnp.square(pr - 1.0))) / 2.0
        interp = eps * real + (1.0 - eps) * fake

        def d_sum(x_in):
            return jnp.sum(d_forward(p, a, x_in, pads))

        g = jax.grad(d_sum)(interp)
        gn = jnp.sqrt(jnp.sum(jnp.square(g), axis=(1, 2, 3)) + 1e-16)
        return loss + 0.01 * jnp.mean(jnp.square(gn - 1.0))

    l, grads = jax.value_and_grad(loss_fn)(params)
    return l, grads


def time_variant(name, pads, batch, steps=16):
    params = make_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(batch, SIZE, SIZE, 3)), jnp.float32)
    real = jnp.asarray(rng.normal(size=(batch, SIZE, SIZE, 3)), jnp.float32)
    fake = jnp.asarray(rng.normal(size=(batch, SIZE, SIZE, 3)), jnp.float32)
    eps = jnp.asarray(rng.uniform(size=(batch, 1, 1, 1)), jnp.float32)
    fn = jax.jit(functools.partial(d_update, pads=pads))
    l, g = fn(params, a, real, fake, eps)
    float(l)
    t0 = time.perf_counter()
    for _ in range(steps):
        l, g = fn(params, a, real, fake, eps)
    float(l)
    dt = (time.perf_counter() - t0) / steps * 1e3
    print(f"b{batch} {name:<6s} {dt:8.2f} ms/update   rows {_rows(pads)}",
          flush=True)
    return dt


def _rows(pads):
    strides = (2, 2, 1, 1, 1)
    r, out = SIZE, []
    for (p0, p1), s in zip(pads, strides):
        r = (r + p0 + p1 - 3) // s + 1
        out.append(r)
    return out


VARIANTS = {
    # faithful: 127/63/61/59/57
    "valid": [(0, 0)] * 5,
    # pad-to-even-then-mask target shapes: 128/64/62/60/58 (the s2 convs
    # provably never read the junk row; s1 junk rows are maskable)
    "even": [(0, 1), (0, 1), (0, 0), (0, 0), (0, 0)],
    # the r4 same_pad geometry: 128/64/64/64/64
    "pow2": [(0, 1), (0, 1), (1, 1), (1, 1), (1, 1)],
}


def main():
    batches = [int(b) for b in sys.argv[1:]] or [4, 16]
    print("backend:", jax.default_backend(), flush=True)
    for batch in batches:
        for name, pads in VARIANTS.items():
            time_variant(name, pads, batch)


if __name__ == "__main__":
    main()
