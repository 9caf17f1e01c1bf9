#!/usr/bin/env python
"""Round-4 eval-throughput measurement (VERDICT r3 item 5).

Times the SHIPPED eval runner (`eval.runner._run_cases`) at
eval_batch 1/4/16 on the active backend, with the norm_fwd compile warmed
OUTSIDE the timed region (each config is run twice; the second run is
reported — the first pays the relay compile of the uint8-input jit).

Run on the real chip: python scripts/probe_eval3.py [n_images]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from PIL import Image

    from tactile_gan_tpu.data.dataset import PairedDataset
    from tactile_gan_tpu.eval.runner import _run_cases
    from tactile_gan_tpu.models.factory import create_generator

    n_img = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = 256
    print("backend:", jax.default_backend(), flush=True)

    with tempfile.TemporaryDirectory() as tmp:
        sdir = os.path.join(tmp, "test", "source")
        tdir = os.path.join(tmp, "test", "tactile")
        os.makedirs(sdir), os.makedirs(tdir)
        rng = np.random.default_rng(0)
        for i in range(n_img):
            Image.fromarray(rng.integers(0, 255, (size, size, 3),
                                         dtype=np.uint8)
                            ).save(os.path.join(sdir, f"s_{i:04d}.png"))
            Image.fromarray(rng.integers(0, 255, (size, size, 3),
                                         dtype=np.uint8)
                            ).save(os.path.join(tdir, f"t_{i:04d}.tiff"))
        ds = PairedDataset(sdir, size=size, mode="test", aug=False,
                           target="rgb")

        gen = create_generator("UNet++", output_dim=3, nf=64, activation=True,
                               compute_dtype=jnp.bfloat16, use_pallas=False)
        params = gen.init(jax.random.key(0), jnp.zeros((1, size, size, 3)))

        def fwd(x):
            return gen.apply(params, x)

        for eval_batch in (1, 4, 16):
            for rep in range(2):
                out = os.path.join(tmp, f"out_b{eval_batch}_{rep}")
                t0 = time.perf_counter()
                acc, _, _ = _run_cases(fwd, ds, out, "rgb", True,
                                       eval_batch=eval_batch, threads=8)
                dt = time.perf_counter() - t0
                tag = "warm" if rep else "cold"
                print(f"b{eval_batch:<2d} {tag}: {dt:7.2f} s  "
                      f"{n_img / dt:6.2f} img/s  (n_metrics={len(acc)})",
                      flush=True)


if __name__ == "__main__":
    main()
