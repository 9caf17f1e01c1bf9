#!/usr/bin/env python
"""Performance laboratory: measured experiments behind the round-2 perf work
(VERDICT r1 items 3/4/7). Each subcommand times one hypothesis on the real
device; results get recorded in BASELINE.md (including rejects, so future
rounds don't re-run dead ends).

Timing convention: scalar value readback (float(...)) — block_until_ready
does not reliably block through the axon relay (CLAUDE.md).

Usage: python scripts/perf_lab.py <exp> [...]
  convs    — microbench the generator's hot conv shapes (TFLOP/s each)
  aug      — augmentation variants: gather (prod) vs two-pass take_along_axis
  step     — full-step variants: remat blocks / pallas / xla at b4 and b16
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x).astype(jnp.float32))


def bench_fn(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out if not isinstance(out, tuple) else out[0])
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------------------


def exp_convs():
    import jax
    import jax.numpy as jnp
    from tactile_gan_tpu.ops.conv import conv2d

    rng = np.random.default_rng(0)
    cases = [
        # (name, N, H, C_in, C_out, k, stride)  — generator hot shapes
        ("row0 3x3 64->64 @256", 4, 256, 64, 64, 3, 1),
        ("row0 3x3 384->64 @256 (node0_4)", 4, 256, 384, 64, 3, 1),
        ("row1 3x3 384->128 @128", 4, 128, 384, 128, 3, 1),
        ("row2 3x3 256->256 @64", 4, 64, 256, 256, 3, 1),
        ("s2d-exact row0: 3x3 256->256 @128 (4x FLOPs of 64->64@256)",
         4, 128, 256, 256, 3, 1),
    ]
    for name, n, hw, cin, cout, k, s in cases:
        x = jnp.asarray(rng.normal(size=(n, hw, hw, cin)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.02)

        f = jax.jit(lambda a, b: conv2d(a, b, stride=s, padding=k // 2,
                                        compute_dtype=jnp.bfloat16))
        dt = bench_fn(f, x, w)
        flops = 2 * n * (hw // s) ** 2 * k * k * cin * cout
        print(f"{name}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TFLOP/s "
              f"({flops/dt/197e12*100:.0f}% of v5e bf16 peak)", flush=True)

    # im2col+dot formulation of the C=64 row-0 conv.
    x = jnp.asarray(rng.normal(size=(4, 256, 256, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * 0.02)

    def im2col_conv(a, b):
        from jax import lax
        p = lax.conv_general_dilated_patches(
            a.astype(jnp.bfloat16), (3, 3), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=lax.conv_dimension_numbers(
                a.shape, (3, 3, 64, 64), ("NHWC", "HWIO", "NHWC")))
        bm = b.astype(jnp.bfloat16).transpose(2, 0, 1, 3).reshape(576, 64)
        return jnp.einsum("nhwk,ko->nhwo", p, bm).astype(jnp.float32)

    dt = bench_fn(jax.jit(im2col_conv), x, w)
    flops = 2 * 4 * 256 * 256 * 9 * 64 * 64
    print(f"row0 im2col+dot 64->64 @256: {dt*1e3:.3f} ms  "
          f"{flops/dt/1e12:.1f} TFLOP/s", flush=True)

    # How much do the norms between convs cost? conv->IN->relu chain vs conv.
    from tactile_gan_tpu.models.blocks import apply_norm_act
    scale = jnp.ones((64,), jnp.float32)
    off = jnp.zeros((64,), jnp.float32)

    def chain(a, b, pallas):
        y = conv2d(a, b, padding=1, compute_dtype=jnp.bfloat16)
        return apply_norm_act(y, scale, off, "relu", use_pallas=pallas)

    for pallas in (False, True):
        f = jax.jit(lambda a, b, p=pallas: chain(a, b, p))
        dt = bench_fn(f, x, w)
        print(f"row0 conv+IN+relu ({'pallas' if pallas else 'xla'}): "
              f"{dt*1e3:.3f} ms", flush=True)


# ---------------------------------------------------------------------------


def exp_aug():
    import jax
    import jax.numpy as jnp
    from tactile_gan_tpu.data import augment as A

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 255, (4, 256, 256, 3), dtype=np.uint8))
    tgt = jnp.asarray(rng.integers(0, 255, (4, 256, 256, 3), dtype=np.uint8))
    key = jax.random.key(0)

    def run(warp_fn, name):
        def pair(s, t, k):
            k1, k2, ka = jax.random.split(k, 3)
            m = A._inverse_affine_matrix(ka, 256, 256)
            return warp_fn(s, m, nearest=False), warp_fn(t, m, nearest=True)

        @jax.jit
        def full(s, t, k):
            sf = s.astype(jnp.float32) / 255.0
            tf = t.astype(jnp.float32) / 255.0
            keys = jax.random.split(k, s.shape[0])
            a, b = jax.vmap(pair)(sf, tf, keys)
            return a + 0 * b[..., :1]

        dt = bench_fn(full, src, tgt, key)
        print(f"aug warp [{name}]: {dt*1e3:.3f} ms/batch", flush=True)
        return full(src, tgt, key)

    ref = run(A._warp, "gather (production)")

    def warp_tala(img, mat, *, nearest):
        """Two-pass resample via per-row take_along_axis (structured gather
        along one axis at a time instead of 4 flat 2-D gathers)."""
        h, w, _ = img.shape
        a00, a01, tx = mat[0, 0], mat[0, 1], mat[0, 2]
        a10, a11, ty = mat[1, 0], mat[1, 1], mat[1, 2]
        xo = jnp.arange(w, dtype=jnp.float32)
        yo = jnp.arange(h, dtype=jnp.float32)

        def resample(data, coords, axis):
            # data: (h, w, c); coords broadcast to (h, w): source positions
            # along `axis`. Returns lerp'd samples with zero outside.
            size = data.shape[axis]
            if nearest:
                i0 = jnp.round(coords).astype(jnp.int32)
                inb = (i0 >= 0) & (i0 < size)
                i0c = jnp.clip(i0, 0, size - 1)
                v = jnp.take_along_axis(data, i0c[..., None], axis=axis)
                return jnp.where(inb[..., None], v, 0.0)
            i0 = jnp.floor(coords).astype(jnp.int32)
            f = (coords - i0)[..., None]
            out = 0.0
            for d, wgt in ((0, 1.0 - f), (1, f)):
                idx = i0 + d
                inb = (idx >= 0) & (idx < size)
                idxc = jnp.clip(idx, 0, size - 1)
                v = jnp.take_along_axis(data, idxc[..., None], axis=axis)
                out = out + wgt * jnp.where(inb[..., None], v, 0.0)
            return out

        xs_h = (a00 * xo[None, :]
                + a01 * (yo[:, None] - a10 * xo[None, :] - ty) / a11 + tx)
        tmp = resample(img, xs_h, axis=1)
        ys = a10 * xo[None, :] + a11 * yo[:, None] + ty
        out = resample(tmp, ys, axis=0)
        return out

    got = run(warp_tala, "two-pass take_along_axis")
    diff = float(jnp.max(jnp.abs(ref - got)))
    print(f"  max|gather - two-pass| = {diff:.4f} (two-pass interpolation "
          "differs from direct 2-D bilinear by design)", flush=True)


# ---------------------------------------------------------------------------


def exp_step():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from bench import _build_step, _time_step

    results = {}
    for batch in (4, 16):
        for variant in ("xla", "xla+remat", "pallas"):
            if variant == "xla+remat":
                import tactile_gan_tpu.models.unet_plusplus as upp
                import tactile_gan_tpu.models.blocks as B
                orig = upp.DoubleConvBlock
                upp.DoubleConvBlock = nn.remat(B.DoubleConvBlock)
                try:
                    _, _, st, step = _build_step(batch, False)
                finally:
                    upp.DoubleConvBlock = orig
            else:
                _, _, st, step = _build_step(batch, variant == "pallas")
            ips, _ = _time_step(step, st, batch, 12)
            results[f"b{batch}_{variant}"] = round(ips, 2)
            print(f"b{batch} {variant}: {ips:.2f} img/s", flush=True)
    print(results)




def exp_convs2():
    """Alternative exact lowerings for the pathological row-0 conv
    (3x3 64->64 @256^2 b4 measured at 4% of peak via lax.conv bf16)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tactile_gan_tpu.ops.conv import conv2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 256, 256, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * 0.02)

    ref = jax.jit(lambda a, b: conv2d(a, b, padding=1,
                                      compute_dtype=jnp.bfloat16))
    dt = bench_fn(ref, x, w)
    want = ref(x, w)
    flops = 2 * 4 * 256 * 256 * 9 * 64 * 64
    print(f"baseline lax.conv bf16: {dt*1e3:.3f} ms "
          f"({flops/dt/1e12:.1f} TFLOP/s)", flush=True)

    def report(name, f):
        fj = jax.jit(f)
        got = fj(x, w)
        err = float(jnp.max(jnp.abs(got - want)))
        dt = bench_fn(fj, x, w)
        print(f"{name}: {dt*1e3:.3f} ms ({flops/dt/1e12:.1f} TFLOP/s) "
              f"max|err|={err:.2e}", flush=True)

    report("lax.conv f32",
           lambda a, b: conv2d(a, b, padding=1, compute_dtype=jnp.float32))

    def nine_shift(a, b):
        ab = a.astype(jnp.bfloat16)
        n, h, ww_, c = a.shape
        pad = jnp.pad(ab, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for di in range(3):
            for dj in range(3):
                sl = pad[:, di:di + h, dj:dj + ww_, :]
                t = jnp.dot(sl.reshape(-1, c),
                            b[di, dj].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                out = t if out is None else out + t
        return out.reshape(n, h, ww_, -1)

    report("9-shift matmul bf16", nine_shift)

    def nchw(a, b):
        ab = a.astype(jnp.bfloat16).transpose(0, 3, 1, 2)
        bb = b.astype(jnp.bfloat16).transpose(3, 2, 0, 1)  # OIHW
        dn = lax.conv_dimension_numbers(ab.shape, bb.shape,
                                        ("NCHW", "OIHW", "NCHW"))
        o = lax.conv_general_dilated(ab, bb, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=dn)
        return o.astype(jnp.float32).transpose(0, 2, 3, 1)

    report("NCHW layout bf16", nchw)

    # The s2d-variant row-0 shapes for reference.
    for cin, cout, hw in ((128, 128, 128), (12, 128, 128), (640, 128, 128)):
        xx = jnp.asarray(
            rng.normal(size=(4, hw, hw, cin)).astype(np.float32))
        wwk = jnp.asarray(
            rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.02)
        f = jax.jit(lambda a, b: conv2d(a, b, padding=1,
                                        compute_dtype=jnp.bfloat16))
        dt = bench_fn(f, xx, wwk)
        fl = 2 * 4 * hw * hw * 9 * cin * cout
        print(f"s2d-variant conv {cin}->{cout} @{hw}: {dt*1e3:.3f} ms "
              f"({fl/dt/1e12:.1f} TFLOP/s)", flush=True)

    # Backward cost of the baseline vs 9-shift (grad wrt x and w).
    for name, f in (("lax.conv", lambda a, b: conv2d(
            a, b, padding=1, compute_dtype=jnp.bfloat16)),
                    ("9-shift", nine_shift)):
        g = jax.jit(jax.grad(lambda a, b: jnp.sum(f(a, b) ** 2),
                             argnums=(0, 1)))
        dt = bench_fn(lambda a, b: g(a, b)[0], x, w)
        print(f"fwd+bwd {name}: {dt*1e3:.3f} ms", flush=True)


def exp_convs3():
    """Chained-timing redo of the conv microbenches: a single jitted
    fori_loop re-applies the op N times, so the ~2.4 ms per-dispatch floor of
    the axon relay (which invalidated exp_convs/exp_convs2's isolated-call
    numbers) cancels out: t_op = (t(62 iters) - t(12 iters)) / 50."""
    import jax
    import jax.numpy as jnp
    from tactile_gan_tpu.ops.conv import conv2d

    rng = np.random.default_rng(0)

    def chained_ms(op, x, *rest, iters=50):
        @jax.jit
        def run(x, n):
            def body(i, c):
                scale = 1.0 + 1e-6 * i.astype(jnp.float32)
                o = op(x * scale, *rest)
                return c + jnp.sum(o.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(run(x, 2))
        t0 = time.perf_counter()
        float(run(x, 12 + iters))
        t_long = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(x, 12))
        t_short = time.perf_counter() - t0
        return max(0.0, (t_long - t_short) / iters * 1e3)

    cases = [
        ("row0 3x3 64->64 @256", 256, 64, 64),
        ("row0 3x3 192->64 @256 (node0_1)", 256, 192, 64),
        ("row0 3x3 384->64 @256 (node0_4)", 256, 384, 64),
        ("row1 3x3 384->128 @128", 128, 384, 128),
        ("row2 3x3 256->256 @64", 64, 256, 256),
        ("s2d-var 3x3 128->128 @128", 128, 128, 128),
        ("s2d-var 3x3 640->128 @128", 128, 640, 128),
        ("s2d-exact 3x3 256->256 @128", 128, 256, 256),
        ("row0 4x4s2 would-be n/a skip", 0, 0, 0),
    ]
    total_row0 = 0.0
    for name, hw, cin, cout in cases:
        if hw == 0:
            continue
        x = jnp.asarray(rng.normal(size=(4, hw, hw, cin)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.02)
        ms = chained_ms(
            lambda a, b: conv2d(a, b, padding=1, compute_dtype=jnp.bfloat16),
            x, w)
        fl = 2 * 4 * hw * hw * 9 * cin * cout
        print(f"{name}: {ms:.3f} ms  {fl/ms*1e3/1e12:.1f} TFLOP/s "
              f"({fl/ms*1e3/197e12*100:.0f}%)", flush=True)
        if name.startswith("row0 3x3 64->64"):
            total_row0 = ms

    # Chained aug (gather warp), batch of 4 source+target pairs.
    from tactile_gan_tpu.data.augment import preprocess_batch
    src = jnp.asarray(rng.integers(0, 255, (4, 256, 256, 3), dtype=np.uint8))
    tgt = jnp.asarray(rng.integers(0, 255, (4, 256, 256, 3), dtype=np.uint8))

    @jax.jit
    def aug_chain(n):
        def body(i, c):
            k = jax.random.fold_in(jax.random.key(0), i)
            a, b = preprocess_batch(src, tgt, k, augment=True)
            return c + jnp.sum(a) + jnp.sum(b)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(aug_chain(2))
    t0 = time.perf_counter(); float(aug_chain(32)); t_l = time.perf_counter() - t0
    t0 = time.perf_counter(); float(aug_chain(2)); t_s = time.perf_counter() - t0
    print(f"aug gather chained: {(t_l - t_s)/30*1e3:.3f} ms/batch", flush=True)


def exp_r2():
    """Round-2 step variants. Each argv spec is b<batch>_<pallas|xla>_<split|concat>,
    e.g. `perf_lab.py r2 b4_pallas_split b16_pallas_split b16_xla_split`."""
    from bench import _build_step, _time_step

    specs = sys.argv[2:] or ["b4_pallas_split", "b16_pallas_split",
                             "b16_xla_split"]
    results = {}
    for spec in specs:
        b_s, kern, cat = spec.split("_", 2)
        batch = int(b_s[1:])
        _, _, st, step = _build_step(batch, kern == "pallas",
                                     split_concat=cat.startswith("split"),
                                     space_to_depth=cat.endswith("s2d"))
        ips, _ = _time_step(step, st, batch, 12)
        results[spec] = round(ips, 2)
        print(f"{spec}: {ips:.2f} img/s", flush=True)
    print(results)


def exp_row0():
    """Exact-rewrite candidates for the 16%-util row-0 convs (cout=64):
    does padding cout (or cin) to the 128-lane width beat XLA's native
    handling? All variants are numerically exact (pad with zeros, slice)."""
    import jax
    import jax.numpy as jnp
    from tactile_gan_tpu.ops.conv import conv2d

    rng = np.random.default_rng(0)

    def chained_ms(op, x, *rest, iters=40):
        @jax.jit
        def run(x, n):
            def body(i, c):
                scale = 1.0 + 1e-6 * i.astype(jnp.float32)
                o = op(x * scale, *rest)
                return c + jnp.sum(o.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(run(x, 2))
        t0 = time.perf_counter(); float(run(x, 10 + iters))
        t_long = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run(x, 10))
        t_short = time.perf_counter() - t0
        return max(0.0, (t_long - t_short) / iters * 1e3)

    x = jnp.asarray(rng.normal(size=(4, 256, 256, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * .02)
    xb = x.astype(jnp.bfloat16)
    true_flops = 2 * 4 * 256 * 256 * 9 * 64 * 64

    def report(name, op, *args):
        ms = chained_ms(op, *args)
        print(f"{name}: {ms:.3f} ms ({true_flops/ms*1e3/1e12:.1f} TFLOP/s "
              f"on true FLOPs)", flush=True)

    report("baseline 64->64 f32 io/bf16 mxu",
           lambda a, b: conv2d(a, b, padding=1, compute_dtype=jnp.bfloat16),
           x, w)
    w128 = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, 64)))
    report("cout-padded 64->128, slice",
           lambda a, b: conv2d(a, b, padding=1,
                               compute_dtype=jnp.bfloat16)[..., :64],
           x, w128)
    wi = jnp.pad(w, ((0, 0), (0, 0), (0, 64), (0, 0)))
    xi = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 64)))
    report("cin+cout padded 128->128, slice",
           lambda a, b: conv2d(a, b, padding=1,
                               compute_dtype=jnp.bfloat16)[..., :64],
           xi, jnp.pad(w128, ((0, 0), (0, 0), (0, 64), (0, 0))))
    report("bf16 io 64->64",
           lambda a, b: conv2d(a, b, padding=1, compute_dtype=jnp.bfloat16),
           xb, w.astype(jnp.bfloat16))
    report("f32 mxu 64->64",
           lambda a, b: conv2d(a, b, padding=1, compute_dtype=jnp.float32),
           x, w)
    # fwd+bwd of baseline vs cout-padded (what the train step actually pays)
    for name, f, a, b in (
            ("fwd+bwd baseline", lambda p, q: conv2d(
                p, q, padding=1, compute_dtype=jnp.bfloat16), x, w),
            ("fwd+bwd cout-padded", lambda p, q: conv2d(
                p, q, padding=1, compute_dtype=jnp.bfloat16)[..., :64],
             x, w128)):
        g = jax.jit(jax.grad(lambda p, q: jnp.sum(f(p, q) ** 2),
                             argnums=(0, 1)))
        ms = chained_ms(lambda p, q=b: g(p, q)[0], a)
        print(f"{name}: {ms:.3f} ms", flush=True)


def exp_ablate():
    """Factor the full step: toggle GP / aug off and time, at a given batch.
    argv: [batch [pallas|xla]] (default 4 pallas)."""
    import jax.numpy as jnp
    from tactile_gan_tpu.core.config import TrainConfig
    from tactile_gan_tpu.models.factory import (
        create_discriminator, create_generator,
    )
    from tactile_gan_tpu.train.schedule import multistep_lr
    from tactile_gan_tpu.train.state import create_train_state, make_optimizer
    from tactile_gan_tpu.train.step import build_train_step
    from bench import _time_step, NF, SIZE
    import jax

    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    pallas = (sys.argv[3] if len(sys.argv) > 3 else "pallas") == "pallas"

    def build(no_aug, gp):
        cfg = TrainConfig(gen="UNet++", nf=NF, batch_size=batch,
                          image_size=SIZE, loss="ls", lambda_per=0.0,
                          lambda_gp=0.01 if gp else 0.0,
                          compute_dtype="bfloat16", no_aug=no_aug,
                          use_pallas=pallas)
        gen = create_generator(cfg.gen, cfg.output_dim, cfg.nf,
                               cfg.activation, compute_dtype=jnp.bfloat16,
                               use_pallas=pallas)
        disc = create_discriminator("patch", cfg.nf, cfg.activation,
                                    compute_dtype=jnp.bfloat16,
                                    use_pallas=pallas)
        sched = multistep_lr(cfg.lr, cfg.epoch_constant, cfg.total_epochs, 100)
        g_tx, d_tx = make_optimizer(sched, cfg.beta1), make_optimizer(sched, cfg.beta1)
        ex = jnp.zeros((batch, SIZE, SIZE, 3))
        state = create_train_state(gen, disc, ex, ex, jax.random.key(0),
                                   g_tx, d_tx)
        return state, build_train_step(cfg, gen, disc, g_tx, d_tx), gp

    for name, no_aug, gp in (("full", False, True), ("no_gp", False, False),
                             ("no_aug", True, True),
                             ("no_gp_no_aug", True, False)):
        state, step, gp_on = build(no_aug, gp)
        ips, _ = _time_step(
            lambda s, a, b, k, apply_gp=True: step(s, a, b, k, apply_gp=gp_on),
            state, batch, 12)
        print(f"b{batch} {'pallas' if pallas else 'xla'} {name}: "
              f"{ips:.2f} img/s ({batch/ips*1e3:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    exp = sys.argv[1] if len(sys.argv) > 1 else "convs"
    {"convs": exp_convs, "convs2": exp_convs2, "convs3": exp_convs3,
     "aug": exp_aug, "step": exp_step, "r2": exp_r2,
     "ablate": exp_ablate, "row0": exp_row0}[exp]()
