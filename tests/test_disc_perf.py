"""Round-4 discriminator-side performance features.

- gp_fused: the fused-GP step form (interpolates stacked into the one D
  forward, inner gradient from its vjp pullback) is EXACTLY the nested-grad
  form — losses, GP value and parameter updates must agree to fp-noise.
- disc_bf16: the bf16-resident discriminator is the same function within
  bf16 rounding; the GP value drift is bounded (the real drift/quality
  numbers are measured on TPU, BASELINE.md round 4 — this pins the wiring).
- disc_same_pad: the SAME-pad variant has pow2 patch maps and the SAME
  parameter shapes as the faithful valid-pad network.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tactile_gan_tpu.core.config import TrainConfig
from tactile_gan_tpu.models.factory import create_discriminator, create_generator
from tactile_gan_tpu.train.schedule import multistep_lr
from tactile_gan_tpu.train.state import create_train_state, make_optimizer
from tactile_gan_tpu.train.step import build_train_step

RNG = np.random.default_rng(17)


def _setup(nf=4, size=32, batch=2, **cfg_kw):
    defaults = dict(gen="UNet++", nf=nf, batch_size=batch, image_size=size,
                    loss="ls", lambda_a=1.0, lambda_per=0.0, lambda_gp=0.01,
                    no_aug=True, compute_dtype="float32")
    defaults.update(cfg_kw)
    cfg = TrainConfig(**defaults)
    gen = create_generator("UNet++", 3, nf, activation=True)
    disc = create_discriminator("patch", nf, activation=True,
                                same_pad=cfg.disc_same_pad)
    sched = multistep_lr(cfg.lr, cfg.epoch_constant, cfg.total_epochs, 100)
    g_tx, d_tx = make_optimizer(sched, cfg.beta1), make_optimizer(sched, cfg.beta1)
    ex = jnp.zeros((batch, size, size, 3), jnp.float32)
    state = create_train_state(gen, disc, ex, ex, jax.random.key(5),
                               g_tx, d_tx)
    step = build_train_step(cfg, gen, disc, g_tx, d_tx)
    return cfg, state, step


def _batch(batch, size):
    src = jnp.asarray(RNG.integers(0, 255, (batch, size, size, 3),
                                   dtype=np.uint8))
    tgt = jnp.asarray(RNG.integers(0, 255, (batch, size, size, 3),
                                   dtype=np.uint8))
    return src, tgt


def test_gp_fused_step_matches_unfused():
    """Same state, same inputs, one GP-on step under both step forms:
    losses (incl. the GP value) and the updated parameters agree."""
    _, state_a, step_fused = _setup(gp_fused=True)
    _, state_b, step_plain = _setup(gp_fused=False)
    src, tgt = _batch(2, 32)
    key = jax.random.key(11)

    sa, ma = step_fused(state_a, src, tgt, key, apply_gp=True)
    sb, mb = step_plain(state_b, src, tgt, key, apply_gp=True)

    for k in ("loss_d", "loss_g", "loss_l1", "loss_gp"):
        va, vb = float(getattr(ma, k)), float(getattr(mb, k))
        np.testing.assert_allclose(va, vb, rtol=2e-5, atol=1e-7, err_msg=k)
    assert float(ma.loss_gp) > 0.0  # the penalty actually engaged

    flat_a = jax.tree.leaves(sa.d_params)
    flat_b = jax.tree.leaves(sb.d_params)
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=5e-4, atol=5e-6)


def test_gp_fused_inner_grad_matches_gradient_penalty():
    """The pullback-derived GP equals losses.gradient_penalty on the same
    disc/interpolates — the unit-level version of the step parity."""
    from tactile_gan_tpu.losses.gradient_penalty import (
        gp_interpolates, gp_penalty, gradient_penalty,
    )

    disc = create_discriminator("patch", 4, activation=True)
    b, size = 2, 32
    img = jnp.asarray(RNG.normal(size=(b, size, size, 3)).astype(np.float32))
    real = jnp.asarray(RNG.normal(size=(b, size, size, 3)).astype(np.float32))
    fake = jnp.asarray(RNG.normal(size=(b, size, size, 3)).astype(np.float32))
    params = disc.init(jax.random.key(0), img, real)
    key = jax.random.key(3)

    want = gradient_penalty(
        lambda a, m: disc.apply(params, a, m)[0], img, real, fake, key,
        version=2, lambda_gp=0.01)

    interp = gp_interpolates(real, fake, key, version=2)
    stacked_img = jnp.concatenate([img, img, img], axis=0)
    stacked_mask = jnp.concatenate([fake, real, interp], axis=0)

    def fwd(m):
        return disc.apply(params, stacked_img, m)[0].astype(jnp.float32)

    logits, pb = jax.vjp(fwd, stacked_mask)
    cot = jnp.concatenate([jnp.zeros((2 * b,) + logits.shape[1:]),
                           jnp.ones((b,) + logits.shape[1:])], axis=0)
    (gm,) = pb(cot)
    got = gp_penalty(gm[2 * b:], lambda_gp=0.01)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)
    # Rows that were not in the GP cotangent get exactly zero gradient
    # (per-sample independence of every D op).
    assert float(jnp.max(jnp.abs(gm[:2 * b]))) == 0.0


def test_disc_bf16_resident_close_to_f32():
    disc32 = create_discriminator("patch", 8, activation=True,
                                  compute_dtype=jnp.bfloat16, resident=False)
    disc16 = create_discriminator("patch", 8, activation=True,
                                  compute_dtype=jnp.bfloat16, resident=True)
    b, size = 2, 64
    img = jnp.asarray(RNG.normal(size=(b, size, size, 3)).astype(np.float32))
    mask = jnp.asarray(RNG.normal(size=(b, size, size, 3)).astype(np.float32))
    params = disc32.init(jax.random.key(0), img, mask)

    l32, f32feats = disc32.apply(params, img, mask)
    l16, f16feats = disc16.apply(params, img, mask)
    assert l16.dtype == jnp.float32  # head contract: logits always f32
    assert all(f.dtype == jnp.bfloat16 for f in f16feats)
    # Sigmoid output in [0,1]: absolute tolerance at bf16 resolution.
    np.testing.assert_allclose(np.asarray(l16), np.asarray(l32), atol=0.05)


def test_disc_same_pad_geometry_and_param_shapes():
    b, size = 1, 64
    img = jnp.zeros((b, size, size, 3))
    valid = create_discriminator("patch", 4, activation=True)
    same = create_discriminator("patch", 4, activation=True, same_pad=True)
    pv = valid.init(jax.random.key(0), img, img)
    ps = same.init(jax.random.key(0), img, img)

    lv, fv = valid.apply(pv, img, img)
    ls, fs = same.apply(ps, img, img)
    # valid: 64 -> 31 -> 15 -> 13 -> 11 -> 9; same: 64 -> 32 -> 16 -> 16 -> 16
    assert lv.shape == (b, 9, 9, 1)
    assert ls.shape == (b, 16, 16, 1)
    assert [f.shape[1] for f in fs] == [32, 16, 16, 16]
    # Identical parameter pytree shapes (checkpoint-shape compatible).
    sv = jax.tree.map(lambda a: a.shape, pv)
    ss = jax.tree.map(lambda a: a.shape, ps)
    assert sv == ss


def test_same_pad_step_runs_with_gp():
    """The SAME-pad variant trains through the full GP-on step (both fused
    and nested forms are second-order differentiable)."""
    for fused in (True, False):
        _, state, step = _setup(gp_fused=fused, disc_same_pad=True)
        src, tgt = _batch(2, 32)
        s, m = step(state, src, tgt, jax.random.key(1), apply_gp=True)
        assert np.isfinite(float(m.loss_d))
        assert float(m.loss_gp) > 0.0


def test_config_gates_cpu_defaults():
    cfg = TrainConfig()
    # CPU backend: both auto gates stay off; explicit flags force.
    assert cfg.effective_gp_fused() is False
    assert cfg.effective_disc_bf16() is False
    assert TrainConfig(gp_fused=True).effective_gp_fused() is True
    assert TrainConfig(disc_bf16=True).effective_disc_bf16() is True
    # disc_bf16 auto never engages under f32 compute even on TPU.
    assert TrainConfig(compute_dtype="float32").effective_disc_bf16() is False
