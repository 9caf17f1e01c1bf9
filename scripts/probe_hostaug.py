#!/usr/bin/env python
"""End-to-end probe: --host_aug vs on-device augmentation (round 3).

Round-2 xplane put the on-device aug gathers at ~11 ms of the ~100 ms b4
step (tile-granular floor — four device-side rewrites rejected). --host_aug
moves the flip/affine into the decode pool one batch ahead; this measures
the real Trainer (decode + aug + step pipelined) on a synthetic dataset.

Run on the real chip: python scripts/probe_hostaug.py [b4|b16|all]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def make_data(root, n=96, size=256):
    import subprocess
    src_dir = os.path.join(root, "data", "train", "source")
    if not os.path.isdir(src_dir) or len(os.listdir(src_dir)) < n:
        subprocess.run(
            [sys.executable, "/root/repo/scripts/make_synth_dataset.py",
             "--out", os.path.join(root, "data"), "--n_train", str(n),
             "--n_test", "0", "--size", str(size)], check=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
    return os.path.join(root, "data")


def run_one(data, batch, host_aug, epochs=4):
    from tactile_gan_tpu.core.config import TrainConfig
    from tactile_gan_tpu.data.dataset import PairedDataset
    from tactile_gan_tpu.train.loop import Trainer

    cfg = TrainConfig(data=os.path.join(data, "train", "source"),
                      gen="UNet++", nf=64,
                      batch_size=batch, image_size=256, loss="ls",
                      lambda_per=0.0, lambda_gp=0.01, total_epochs=1,
                      compute_dtype="bfloat16", host_aug=host_aug,
                      threads=8, folder_save=f"probe_hostaug_{batch}_{host_aug}")
    ds = PairedDataset(cfg.data, size=256, mode="train", aug=True,
                       target="rgb")
    tr = Trainer(cfg, ds, use_mesh=False)
    n_img = (len(ds) // batch) * batch
    times = []
    import jax
    with (jax.sharding.set_mesh(tr.mesh) if tr.mesh is not None
          else __import__("contextlib").nullcontext()):
        for e in range(epochs):
            t0 = time.perf_counter()
            # mirror one epoch of Trainer._train_epochs without artifacts
            staged = None
            metrics = []
            for src_u8, tgt_u8, _ in ds.batches(
                    batch, shuffle=True, seed=cfg.seed + e,
                    drop_last=True, threads=cfg.threads,
                    host_augment=host_aug, augment_seed=cfg.seed + 7919 * e):
                nxt = tr._put_batch(src_u8, tgt_u8)
                if staged is not None:
                    tr.state, m = tr.step_fn(tr.state, *staged, tr.train_key,
                                             apply_gp=True)
                    metrics.append(m)
                staged = nxt
            tr.state, m = tr.step_fn(tr.state, *staged, tr.train_key,
                                     apply_gp=True)
            metrics.append(m)
            float(metrics[-1].loss_d)
            times.append(time.perf_counter() - t0)
    steady = min(times[1:])
    return n_img / steady, times


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "b4"
    data = make_data("/tmp/hostaug_probe")
    combos = []
    if which in ("b4", "all"):
        combos += [(4, False), (4, True)]
    if which in ("b16", "all"):
        combos += [(16, False), (16, True)]
    for batch, ha in combos:
        t0 = time.perf_counter()
        ips, times = run_one(data, batch, ha)
        print(f"b{batch} host_aug={ha}: {ips:.2f} img/s  "
              f"epochs={['%.2f' % t for t in times]}  "
              f"(total {time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
