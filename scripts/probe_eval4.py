#!/usr/bin/env python
"""Eval-pipeline stage isolation (round 5): where does the per-image time go?

probe_eval3 times the whole pipelined runner; this times each stage ALONE on
the chip so the floor argument is measured, not inferred:

  dispatch  jit call + 4-scalar readback, input already on device
  d2h_u8    np.asarray of a resident (B,256,256,3) u8 output
  d2h_f32   same but f32 (the r4 transfer mode)
  h2d       jnp.asarray upload of a host u8 batch (+ scalar readback)
  decode    dataset.load_pair pair decode on the host
  png       the _write_case PNG encodes for one image

Usage: python scripts/probe_eval4.py [batch] [iters]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, iters, batch):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:<10s} {dt * 1e3:8.2f} ms/call  "
          f"{dt / batch * 1e3:8.2f} ms/img", flush=True)
    return dt


def main():
    from PIL import Image

    from tactile_gan_tpu.data.dataset import PairedDataset
    from tactile_gan_tpu.eval.runner import _jits_for, _write_case
    from tactile_gan_tpu.models.factory import create_generator

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    size = 256
    print("backend:", jax.default_backend(), flush=True)

    gen = create_generator("UNet++", output_dim=3, nf=64, activation=True,
                           compute_dtype=jnp.bfloat16, use_pallas=False)
    params = gen.init(jax.random.key(0), jnp.zeros((1, size, size, 3)))

    def fwd(x):
        return gen.apply(params, x)

    jits = _jits_for(fwd)
    rng = np.random.default_rng(0)
    src_h = rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    tgt_h = rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    src = jnp.asarray(src_h)
    tgt = jnp.asarray(tgt_h)

    out_u8, sums = jits["u8_eval"](src, tgt)
    out_f32 = jits["f32"](src)
    np.asarray(out_u8), np.asarray(out_f32), np.asarray(sums)

    def dispatch():
        _, s = jits["u8_eval"](src, tgt)
        np.asarray(s)

    def dispatch_f32():
        o = jits["f32"](src)
        # value readback of one scalar via a tiny fetch is not possible
        # without pulling the buffer; time dispatch+full pull under d2h_f32
        o.block_until_ready()

    timeit("dispatch", dispatch, iters, batch)

    # d2h must touch FRESH device buffers: np.asarray caches the host copy
    # on the jax Array, so re-reading the same buffer times nothing.
    def d2h_series(mode):
        bufs = []
        for _ in range(iters):
            r = jits[mode](src) if mode != "u8_eval" else jits[mode](src, tgt)[0]
            bufs.append(r)
        np.asarray(jits["u8_eval"](src, tgt)[1])  # drain the dispatch queue
        t0 = time.perf_counter()
        for b in bufs:
            np.asarray(b)
        dt = (time.perf_counter() - t0) / iters
        print(f"{'d2h_' + mode:<10s} {dt * 1e3:8.2f} ms/call  "
              f"{dt / batch * 1e3:8.2f} ms/img", flush=True)

    d2h_series("u8")
    d2h_series("f32")
    timeit("d2h_sums", lambda: np.asarray(sums), iters, batch)

    def h2d():
        a = jnp.asarray(src_h)
        b = jnp.asarray(tgt_h)
        float(jnp.sum(a[0, 0, 0]) + jnp.sum(b[0, 0, 0]))

    timeit("h2d", h2d, iters, batch)

    with tempfile.TemporaryDirectory() as tmp:
        sdir = os.path.join(tmp, "test", "source")
        tdir = os.path.join(tmp, "test", "tactile")
        os.makedirs(sdir), os.makedirs(tdir)
        for i in range(batch):
            Image.fromarray(src_h[i]).save(os.path.join(sdir,
                                                        f"s_{i:04d}.png"))
            Image.fromarray(tgt_h[i]).save(os.path.join(tdir,
                                                        f"t_{i:04d}.tiff"))
        ds = PairedDataset(sdir, size=size, mode="test", aug=False,
                           target="rgb")

        def decode():
            for i in range(batch):
                ds.load_pair(i)

        timeit("decode", decode, max(4, iters // 2), batch)

        outdir = os.path.join(tmp, "w")
        for sub in ("out", "sgt", "elm"):
            os.makedirs(os.path.join(outdir, sub), exist_ok=True)
        out_h = np.asarray(out_u8)
        src_f = src_h.astype(np.float32) / 255.0 * 2.0 - 1.0

        def png():
            for i in range(batch):
                _write_case(i, src_f[i], tgt_h[i], out_h[i], outdir, "rgb")

        timeit("png", png, max(4, iters // 2), batch)


if __name__ == "__main__":
    main()
