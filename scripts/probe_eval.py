#!/usr/bin/env python
"""Measure eval-runner throughput: pipelined decode/write pool vs the
round-2 serial loop (VERDICT r2 missing #2 / next #5).

The reference test loop decodes through a 4-worker DataLoader
(/root/reference/test.py:47); round 2's runner decoded serially inline. This
probe times both implementations on the same synthetic 256² test split with
the same jitted forward, on whatever backend is active.

Run on the real chip: python scripts/probe_eval.py [n_images]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def serial_run_cases(forward_chain, dataset, output_path, target_mode,
                     evaluation, eval_batch=1):
    """The round-2 implementation (decode + write inline, no overlap)."""
    from tactile_gan_tpu.eval.metrics import eval_pair
    from tactile_gan_tpu.eval.runner import _write_case
    from tactile_gan_tpu.utils.io import mkdir

    for sub in ("out", "sgt", "elm"):
        mkdir(os.path.join(output_path, sub))
    accuracy, dice, jaccard = [], [], []
    n = len(dataset)
    for start in range(0, n, eval_batch):
        idxs = list(range(start, min(start + eval_batch, n)))
        pairs = [dataset.load_pair(i) for i in idxs]
        srcs = np.stack([p[0] for p in pairs])
        if len(idxs) < eval_batch:
            srcs = np.concatenate(
                [srcs, np.repeat(srcs[-1:], eval_batch - len(idxs), 0)])
        src = jnp.asarray(srcs.astype(np.float32) / 255.0 * 2.0 - 1.0)
        outs = np.asarray(forward_chain(src))
        for k, i in enumerate(idxs):
            out = outs[k]
            tgt = pairs[k][1].astype(np.float32) / 255.0
            if evaluation:
                res = eval_pair(tgt, out)
                accuracy.append(res["accuracy"])
                dice.append(res["dice"])
                jaccard.append(res["jaccard"])
            _write_case(i, np.asarray(src)[k], tgt, out, output_path,
                        target_mode)
    return accuracy, dice, jaccard


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
        params = gen.init(jax.random.key(0),
                          jnp.zeros((1, size, size, 3)))

        results = {}
        for eval_batch in (1, 4):
            fwd = jax.jit(lambda x: gen.apply(params, x))
            # warm the compile at this batch shape
            np.asarray(fwd(jnp.zeros((eval_batch, size, size, 3))))

            for name, fn in (("serial", serial_run_cases),
                             ("pipelined", _run_cases)):
                out = os.path.join(tmp, f"out_{name}_{eval_batch}")
                t0 = time.perf_counter()
                acc, dice, jac = fn(fwd, ds, out, "rgb", True,
                                    eval_batch=eval_batch)
                dt = time.perf_counter() - t0
                results[f"{name}_b{eval_batch}"] = n_img / dt
                print(f"{name:9s} b{eval_batch}: {dt:6.2f} s  "
                      f"{n_img / dt:6.2f} img/s  (n_metrics={len(acc)})",
                      flush=True)

        sp = results["pipelined_b1"] / results["serial_b1"]
        print(f"speedup b1: {sp:.2f}x   "
              f"b4: {results['pipelined_b4'] / results['serial_b4']:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
