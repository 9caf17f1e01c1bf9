#!/usr/bin/env python
"""Real Trainer.train() end-to-end epochs at b4/b16 (the shipped loop with
the round-4 H2D staging thread + single-buffer metric fetch), plus the
host_aug on/off A/B. Prints per-epoch seconds and steady-state img/s.

Usage: python scripts/probe_e2e_real.py [b16 b4 ...] [--no-host-aug-too]
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TRAIN = 96
SIZE = 256


def run(batch, host_aug=True, epochs=6):
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
                      folder_save=f"real_b{batch}",
                      folder_load=f"real_b{batch}")
    ds = PairedDataset(src_dir, size=SIZE, mode="train", aug=True,
                       target="rgb", cache_decoded=True)
    tr = Trainer(cfg, ds)
    tr.train(progress=False)
    secs = tr.epoch_seconds
    steady = min(secs[2:])
    print(f"b{batch} host_aug={host_aug}: epochs "
          + " ".join(f"{s:.3f}" for s in secs)
          + f"  steady {N_TRAIN/steady:.1f} img/s", flush=True)


if __name__ == "__main__":
    specs = [a for a in sys.argv[1:] if a.startswith("b")] or ["b16", "b4"]
    for s in specs:
        b = int(s[1:])
        run(b, host_aug=True)
        run(b, host_aug=False)
