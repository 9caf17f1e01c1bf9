#!/usr/bin/env python
"""Round-4 discriminator-side probes (VERDICT r3 next-round item 1).

Subcommands:
  step  [specs...]  — full G+D step throughput for D-side variants.
                      spec = b<batch>[:flag[:flag...]] with flags from
                      {gpfused, dbf16, samepad, xla} (xla = --no-use_pallas).
                      Default spec set covers the decision matrix.
  drift [batch]     — GP-value drift of the bf16-resident D vs f32-resident
                      from the SAME state/batch (one step), plus the
                      fused-vs-nested GP equality on TPU.

Timing: scalar value readback (the axon relay does not honor
block_until_ready).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = 256
NF = 64


def build(batch, *, gp_fused=None, disc_bf16=None, same_pad=False,
          use_pallas=None, bf16_resident=None):
    import jax
    import jax.numpy as jnp

    from tactile_gan_tpu.core.config import TrainConfig
    from tactile_gan_tpu.models.factory import (
        create_discriminator, create_generator,
    )
    from tactile_gan_tpu.train.schedule import multistep_lr
    from tactile_gan_tpu.train.state import create_train_state, make_optimizer
    from tactile_gan_tpu.train.step import build_train_step

    cfg = TrainConfig(gen="UNet++", nf=NF, batch_size=batch, image_size=SIZE,
                      loss="ls", lambda_per=0.0, lambda_gp=0.01,
                      compute_dtype="bfloat16",
                      use_pallas=True if use_pallas is None else use_pallas,
                      gp_fused=gp_fused, disc_bf16=disc_bf16,
                      disc_same_pad=same_pad, bf16_resident=bf16_resident)
    pallas = cfg.effective_use_pallas(data_axis_size=1)
    gen = create_generator(cfg.gen, cfg.output_dim, cfg.nf, cfg.activation,
                           compute_dtype=jnp.bfloat16, use_pallas=pallas,
                           split_concat=True,
                           lane_pack=cfg.effective_lane_pack(1),
                           packed_row0=cfg.effective_packed_row0(1),
                           bf16_resident=cfg.effective_bf16_resident(1))
    disc = create_discriminator("patch", cfg.nf, cfg.activation,
                                compute_dtype=jnp.bfloat16,
                                resident=cfg.effective_disc_bf16(),
                                same_pad=cfg.disc_same_pad)
    sched = multistep_lr(cfg.lr, cfg.epoch_constant, cfg.total_epochs, 100)
    g_tx = make_optimizer(sched, cfg.beta1)
    d_tx = make_optimizer(sched, cfg.beta1)
    ex = jnp.zeros((batch, SIZE, SIZE, 3))
    state = create_train_state(gen, disc, ex, ex, jax.random.key(0),
                               g_tx, d_tx)
    step = build_train_step(cfg, gen, disc, g_tx, d_tx)
    return cfg, state, step


def time_step(step, state, batch, steps=16):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 255, (batch, SIZE, SIZE, 3),
                                   dtype=np.uint8))
    tgt = jnp.asarray(rng.integers(0, 255, (batch, SIZE, SIZE, 3),
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


def cmd_step():
    specs = sys.argv[2:] or [
        "b4", "b4:gpfused", "b4:dbf16", "b4:gpfused:dbf16",
        "b16:xla", "b16:xla:gpfused", "b16:xla:dbf16",
        "b16:xla:gpfused:dbf16",
        "b4:gpfused:dbf16:samepad", "b16:xla:gpfused:dbf16:samepad",
    ]
    results = {}
    for spec in specs:
        parts = spec.split(":")
        batch = int(parts[0][1:])
        flags = set(parts[1:])
        t0 = time.perf_counter()
        import tactile_gan_tpu.ops.conv as conv_mod
        # globres reproduces the round-3 probe's module-global residency
        # knob: EVERY conv (row 0 included) keeps bf16 out — isolates
        # whether the r3 b16 99.27 was row-0 residency rather than the D.
        conv_mod.RESIDENT_COMPUTE_DTYPE = "globres" in flags
        _, state, step = build(
            batch,
            gp_fused="gpfused" in flags,
            disc_bf16="dbf16" in flags,
            same_pad="samepad" in flags,
            use_pallas=False if "xla" in flags else None,
            bf16_resident=True if "bfres" in flags else None)
        ips = time_step(step, state, batch)
        results[spec] = round(ips, 2)
        print(f"{spec}: {ips:.2f} img/s  (+compile {time.perf_counter()-t0:.0f}s)",
              flush=True)
    print(results)


def cmd_drift():
    import jax

    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    src = jnp.asarray(rng.integers(0, 255, (batch, SIZE, SIZE, 3),
                                   dtype=np.uint8))
    tgt = jnp.asarray(rng.integers(0, 255, (batch, SIZE, SIZE, 3),
                                   dtype=np.uint8))
    key = jax.random.key(1)

    vals = {}
    for name, kw in (
            ("f32_nested", dict(disc_bf16=False, gp_fused=False)),
            ("f32_fused", dict(disc_bf16=False, gp_fused=True)),
            ("bf16_nested", dict(disc_bf16=True, gp_fused=False)),
            ("bf16_fused", dict(disc_bf16=True, gp_fused=True))):
        _, state, step = build(batch, **kw)
        # ONE-step comparisons only: training steps amplify fp noise
        # chaotically (Adam near-zero-grad amplification, CLAUDE.md), so
        # only the same-state step-1 values measure the numerics of the
        # form itself. All configs share init seed + input arrays.
        traj = []
        for i in range(3):
            state, m = step(state, src, tgt, key, apply_gp=True)
            traj.append(float(m.loss_gp))
        vals[name] = traj
        print(f"{name}: gp per step = "
              + " ".join(f"{v:.8f}" for v in traj), flush=True)

    gp_ref = vals["f32_nested"][0]
    for name, traj in vals.items():
        rel = abs(traj[0] - gp_ref) / max(abs(gp_ref), 1e-12)
        print(f"{name}: step-1 GP rel drift vs f32_nested = {rel:.3e}",
              flush=True)


if __name__ == "__main__":
    {"step": cmd_step, "drift": cmd_drift}[sys.argv[1] if len(sys.argv) > 1
                                           else "step"]()
