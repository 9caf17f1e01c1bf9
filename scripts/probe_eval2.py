#!/usr/bin/env python
"""Line-level eval-throughput breakdown (VERDICT r3 item 5): where do the
~460 ms/image go against a 3.7 ms device forward?

Times each pipeline component in isolation on the real backend:
  decode        — PairedDataset.load_pair (PNG/TIFF decode)
  fwd_call      — jitted generator forward, per relay call (batch 1/4/16)
  fwd_chained   — device-only forward time (chained loop, relay amortized)
  d2h           — np.asarray of the output batch (device->host over relay)
  metrics       — eval_pair (float64 reductions)
  png_write     — _write_case (PNG encode + disk)
then full test_model at eval_batch 1/4/16.

Usage: python scripts/probe_eval2.py [n_images]
"""

import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = "/tmp/probe_eval2_data"
    if not os.path.isdir(os.path.join(root, "test", "source")):
        subprocess.run(
            [sys.executable, os.path.join(here, "scripts",
                                          "make_synth_dataset.py"),
             "--out", root, "--n_train", "1", "--n_test", str(n)],
            check=True)

    from tactile_gan_tpu.data.dataset import PairedDataset
    from tactile_gan_tpu.eval.metrics import eval_pair
    from tactile_gan_tpu.eval.runner import _write_case, test_model
    from tactile_gan_tpu.models.factory import create_generator

    ds = PairedDataset(os.path.join(root, "test", "source"), size=256,
                       mode="test", aug=False, target="rgb")
    n = len(ds)
    gen = create_generator("UNet++", 3, 64, True,
                           compute_dtype=jnp.bfloat16, use_pallas=False)
    params = gen.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)))

    # ---- decode ----
    ds.cache_decoded = False
    t0 = time.perf_counter()
    for i in range(n):
        ds.load_pair(i)
    dec_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"decode: {dec_ms:.1f} ms/image", flush=True)

    pairs = [ds.load_pair(i) for i in range(n)]

    # ---- forward call + d2h, per batch size ----
    for b in (1, 4, 16):
        fwd = jax.jit(lambda x: gen.apply(params, x))
        x = jnp.asarray(np.stack([p[0] for p in pairs[:b]])
                        .astype(np.float32) / 255.0 * 2.0 - 1.0)
        y = fwd(x)
        _ = np.asarray(y)  # compile + first transfer
        float(jnp.sum(y))  # warm the sum program too (remote compile!)
        t0 = time.perf_counter()
        reps = max(1, 16 // b)
        for _ in range(reps):
            y = fwd(x)
            host = np.asarray(y)
        both_ms = (time.perf_counter() - t0) / reps * 1e3
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fwd(x)
            float(jnp.sum(y))  # scalar readback only — no bulk d2h
        call_ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"fwd_call b{b}: {call_ms:.1f} ms/call "
              f"({call_ms / b:.1f} ms/img); +bulk d2h: {both_ms:.1f} ms/call "
              f"(d2h {both_ms - call_ms:.1f} ms = "
              f"{b * 256 * 256 * 3 * 4 / max(1e-9, (both_ms - call_ms)) / 1e3:.0f} MB/s)",
              flush=True)

    # ---- metrics ----
    out_img = np.asarray(host)[0]
    tgt = pairs[0][1].astype(np.float32) / 255.0
    t0 = time.perf_counter()
    for _ in range(20):
        eval_pair(tgt, out_img)
    print(f"metrics eval_pair: {(time.perf_counter()-t0)/20*1e3:.1f} ms/image",
          flush=True)

    # ---- png writes ----
    with tempfile.TemporaryDirectory() as d:
        from tactile_gan_tpu.utils.io import mkdir
        for sub in ("out", "sgt", "elm"):
            mkdir(os.path.join(d, sub))
        src_norm = np.asarray(x)[0]
        t0 = time.perf_counter()
        for i in range(8):
            _write_case(i, src_norm, tgt, out_img, d, "rgb")
        print(f"png_write: {(time.perf_counter()-t0)/8*1e3:.1f} ms/image",
              flush=True)

    # ---- full runner ----
    for eb in (1, 4, 16):
        fwd = jax.jit(lambda xx: gen.apply(params, xx))
        with tempfile.TemporaryDirectory() as d:
            test_model(fwd, ds, d, evaluation=True, target_mode="rgb",
                       eval_batch=eb, threads=8)  # compile
            t0 = time.perf_counter()
            acc, _, _ = test_model(fwd, ds, d, evaluation=True,
                                   target_mode="rgb", eval_batch=eb,
                                   threads=8)
            dt = time.perf_counter() - t0
        print(f"test_model eval_batch={eb}: {len(acc)/dt:.2f} img/s "
              f"({dt/len(acc)*1e3:.0f} ms/img)", flush=True)


if __name__ == "__main__":
    main()
