#!/usr/bin/env python
"""Steady-state epoch host-path breakdown (VERDICT r3 item 2): why is the
b16 end-to-end epoch 23% below its own device step?

Mimics Trainer._train_epochs with instrumentation, decode cache hot:
  batch_wait — time blocked in next(batches) (host staging not ready)
  put        — _put_batch (H2D device_put dispatch)
  dispatch   — step_fn call (trace-cached dispatch through the relay)
  sync       — end-of-epoch device_get
plus an isolated H2D bandwidth measurement of the uint8 batch, and epochs
with host_aug ON vs OFF (device aug) at each batch size.

Usage: python scripts/probe_e2e.py [b4 b16 ...]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_TRAIN = 96
SIZE = 256


def run(batch, host_aug=True, epochs=5, threads=8):
    from tactile_gan_tpu.core.config import TrainConfig
    from tactile_gan_tpu.data.dataset import PairedDataset
    from tactile_gan_tpu.train.loop import Trainer

    root = "/tmp/probe_e2e_data"
    src_dir = os.path.join(root, "data", "train", "source")
    if not os.path.isdir(src_dir):
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(
            [sys.executable, os.path.join(here, "scripts",
                                          "make_synth_dataset.py"),
             "--out", os.path.join(root, "data"),
             "--n_train", str(N_TRAIN), "--n_test", "4"], check=True)

    cfg = TrainConfig(data=os.path.join(root, "data"), batch_size=batch,
                      gen="UNet++", nf=64, image_size=SIZE, loss="ls",
                      lambda_per=0.0, lambda_gp=0.01, total_epochs=epochs,
                      compute_dtype="bfloat16", host_aug=host_aug,
                      threads=threads, folder_save=f"probe_b{batch}",
                      folder_load=f"probe_b{batch}")
    ds = PairedDataset(src_dir, size=SIZE, mode="train", aug=True,
                       target="rgb", cache_decoded=True)
    tr = Trainer(cfg, ds)

    # Instrumented epochs (the Trainer's own loop, with timers).
    for epoch in range(epochs):
        t_epoch = time.time()
        waits = {"batch_wait": 0.0, "put": 0.0, "dispatch": 0.0}
        staged = None
        it = ds.batches(batch, shuffle=True, seed=cfg.seed + epoch,
                        drop_last=True, threads=cfg.threads,
                        host_augment=host_aug and not cfg.no_aug,
                        augment_seed=cfg.seed + 7919 * epoch)
        metrics = []
        while True:
            t0 = time.perf_counter()
            try:
                src_u8, tgt_u8, _ = next(it)
            except StopIteration:
                break
            waits["batch_wait"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            nxt = tr._put_batch(src_u8, tgt_u8)
            waits["put"] += time.perf_counter() - t0
            if staged is not None:
                t0 = time.perf_counter()
                tr.state, m = tr.step_fn(tr.state, *staged, tr.train_key,
                                         apply_gp=True)
                metrics.append(m)
                waits["dispatch"] += time.perf_counter() - t0
            staged = nxt
        if staged is not None:
            t0 = time.perf_counter()
            tr.state, m = tr.step_fn(tr.state, *staged, tr.train_key,
                                     apply_gp=True)
            metrics.append(m)
            waits["dispatch"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(metrics)
        sync = time.perf_counter() - t0
        dt = time.time() - t_epoch
        print(f"b{batch} host_aug={host_aug} epoch {epoch}: {dt:.3f}s "
              f"({N_TRAIN/dt:.1f} img/s) wait={waits['batch_wait']*1e3:.0f}ms "
              f"put={waits['put']*1e3:.0f}ms "
              f"dispatch={waits['dispatch']*1e3:.0f}ms sync={sync*1e3:.0f}ms",
              flush=True)

    # Isolated H2D: device_put of one uint8 batch, forced to completion.
    src = np.random.default_rng(0).integers(
        0, 255, (batch, SIZE, SIZE, 3), dtype=np.uint8)
    dev = jax.device_put(src)
    float(jnp.sum(dev.astype(jnp.float32)))
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        dev = jax.device_put(src)
        float(jnp.sum(dev.astype(jnp.float32)))
    ms = (time.perf_counter() - t0) / reps * 1e3
    mb = src.nbytes / 1e6
    print(f"b{batch} H2D+readback: {ms:.1f} ms for {mb:.1f} MB "
          f"(incl. one relay round-trip)", flush=True)


if __name__ == "__main__":
    specs = sys.argv[1:] or ["b16", "b4"]
    for s in specs:
        b = int(s[1:])
        run(b, host_aug=True)
        run(b, host_aug=False)
