#!/usr/bin/env python
"""End-to-end probe: --packed_row0 in the full G+D train step (round 3).

The packed-resident row 0 (ops/packed_row.py) measured 2.3x XLA on the
isolated conv and ~12x on an isolated conv+IN node chain; this measures
what ships: the full b4/b16 train step, packed_row0 on, with the Pallas
norm kernels on/off for the remaining rows.

Run on the real chip: python scripts/probe_packed_step.py [b4|b16|all]
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def build_step(batch, use_pallas, packed_row0):
    import jax
    import jax.numpy as jnp

    from tactile_gan_tpu.core.config import TrainConfig
    from tactile_gan_tpu.models.factory import (
        create_discriminator, create_generator,
    )
    from tactile_gan_tpu.train.schedule import multistep_lr
    from tactile_gan_tpu.train.state import create_train_state, make_optimizer
    from tactile_gan_tpu.train.step import build_train_step

    cfg = TrainConfig(gen="UNet++", nf=64, batch_size=batch, image_size=256,
                      loss="ls", lambda_per=0.0, lambda_gp=0.01,
                      compute_dtype="bfloat16", use_pallas=use_pallas,
                      packed_row0=packed_row0)
    gen = create_generator(cfg.gen, cfg.output_dim, cfg.nf, cfg.activation,
                           compute_dtype=jnp.bfloat16, use_pallas=use_pallas,
                           lane_pack=cfg.effective_lane_pack(data_axis_size=1),
                           packed_row0=cfg.effective_packed_row0())
    disc = create_discriminator("patch", cfg.nf, cfg.activation,
                                compute_dtype=jnp.bfloat16,
                                use_pallas=use_pallas)
    sched = multistep_lr(cfg.lr, cfg.epoch_constant, cfg.total_epochs, 100)
    g_tx = make_optimizer(sched, cfg.beta1)
    d_tx = make_optimizer(sched, cfg.beta1)
    ex = jnp.zeros((batch, 256, 256, 3))
    state = create_train_state(gen, disc, ex, ex, jax.random.key(0),
                               g_tx, d_tx)
    step = build_train_step(cfg, gen, disc, g_tx, d_tx)
    return state, step


def time_step(state, step, batch, steps=20):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 255, (batch, 256, 256, 3),
                                   dtype=np.uint8))
    tgt = jnp.asarray(rng.integers(0, 255, (batch, 256, 256, 3),
                                   dtype=np.uint8))
    key = jax.random.key(1)
    for _ in range(2):
        state, m = step(state, src, tgt, key, apply_gp=True)
    float(m.loss_d)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, src, tgt, key, apply_gp=True)
    float(m.loss_d)
    return batch * steps / (time.perf_counter() - t0)


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "b4"
    combos = []
    if which in ("b4", "all"):
        combos += [(4, True, True), (4, False, True)]
    if which in ("b16", "all"):
        combos += [(16, False, True), (16, True, True)]
    for batch, pallas, pr0 in combos:
        t0 = time.perf_counter()
        state, step = build_step(batch, pallas, pr0)
        ips = time_step(state, step, batch)
        tag = (f"b{batch}_{'pallas' if pallas else 'xla'}"
               f"{'_packedrow0' if pr0 else ''}")
        print(f"{tag}: {ips:.2f} img/s  (built+ran in "
              f"{time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
