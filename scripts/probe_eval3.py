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
        # REAL chart-like pairs, not noise: PNG-encoding noise images costs
        # ~200 ms/image (deflate on incompressible data, probe_eval4) and
        # swamps every pipeline stage — the round-4 noise-based numbers
        # measured the PNG encoder, not the runner.
        import subprocess
        here = os.path.dirname(os.path.abspath(__file__))
        subprocess.run(
            [sys.executable, os.path.join(here, "make_synth_dataset.py"),
             "--out", tmp, "--n_train", "1", "--n_test", str(n_img)],
            check=True, capture_output=True)
        ds = PairedDataset(os.path.join(tmp, "test", "source"), size=size,
                           mode="test", aug=False, target="rgb")

        gen = create_generator("UNet++", output_dim=3, nf=64, activation=True,
                               compute_dtype=jnp.bfloat16, use_pallas=False)
        params = gen.init(jax.random.key(0), jnp.zeros((1, size, size, 3)))

        def fwd(x):
            return gen.apply(params, x)

        for transfer in ("u8", "f32"):
            for eval_batch in (1, 4, 16):
                for rep in range(2):
                    out = os.path.join(tmp, f"out_{transfer}_b{eval_batch}_{rep}")
                    t0 = time.perf_counter()
                    acc, _, _ = _run_cases(fwd, ds, out, "rgb", True,
                                           eval_batch=eval_batch, threads=8,
                                           transfer=transfer)
                    dt = time.perf_counter() - t0
                    tag = "warm" if rep else "cold"
                    print(f"{transfer:<3s} b{eval_batch:<2d} {tag}: "
                          f"{dt:7.2f} s  {n_img / dt:6.2f} img/s  "
                          f"(n_metrics={len(acc)})", flush=True)


if __name__ == "__main__":
    main()
