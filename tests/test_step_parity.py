"""End-to-end one-step training parity vs the PyTorch reference.

Ties the reference models' weights into our flax params, runs ONE full
G+D train step on both sides with identical deterministic settings
(no augmentation, no label smoothing, no GP — the RNG-free subset), and
checks losses and post-Adam parameter updates agree. This pins down the whole
chain: preprocessing, forwards, loss arithmetic, both backward passes, and
the optimizer (betas=(0.9, 0.99), reference /root/reference/train.py:56-57).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as tF

from tactile_gan_tpu.core.config import TrainConfig
from tactile_gan_tpu.models.factory import create_discriminator, create_generator
from tactile_gan_tpu.train.schedule import multistep_lr
from tactile_gan_tpu.train.state import TrainState, create_train_state, make_optimizer
from tactile_gan_tpu.train.step import build_train_step

from torch_ref import patchdisc_params, randomize_, unet_params

RNG = np.random.default_rng(31)


def test_one_train_step_matches_reference(reference_available):
    if not reference_available:
        pytest.skip("reference checkout unavailable")
    from generators.UNet import UNet as RefUNet
    from discriminators.PatchDiscriminator import PatchDiscriminator as RefD

    # 256px: the 7-stage UNet needs >1 spatial element at its bottleneck.
    nf, size, batch = 4, 256, 1
    lr, beta1 = 1e-3, 0.9

    # --- reference side -------------------------------------------------
    ref_g = RefUNet(3, 3, nf, activation=True)
    ref_d = RefD(3, 3, num_filter=nf, return_filters=False, activation=True)
    randomize_(ref_g, seed=41)
    randomize_(ref_d, seed=42)
    opt_g = torch.optim.Adam(ref_g.parameters(), lr=lr, betas=(beta1, 0.99))
    opt_d = torch.optim.Adam(ref_d.parameters(), lr=lr, betas=(beta1, 0.99))

    src_u8 = RNG.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    tgt_u8 = RNG.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    a_t = torch.tensor(
        (src_u8.astype(np.float32) / 255.0 * 2 - 1).transpose(0, 3, 1, 2))
    b_t = torch.tensor((tgt_u8.astype(np.float32) / 255.0).transpose(0, 3, 1, 2))

    # The reference loop arithmetic (/root/reference/train.py:99-168),
    # ls mode without smoothing/GP/perceptual:
    fake = ref_g(a_t)
    opt_d.zero_grad()
    pred_fake = ref_d(a_t, fake.detach())
    pred_real = ref_d(a_t, b_t)
    loss_d_ref = (tF.mse_loss(pred_fake, torch.zeros_like(pred_fake))
                  + tF.mse_loss(pred_real, torch.ones_like(pred_real))) / 2
    loss_d_ref.backward()
    opt_d.step()

    opt_g.zero_grad()
    pred_fake2 = ref_d(a_t, fake)
    loss_g_ref = tF.mse_loss(pred_fake2, torch.ones_like(pred_fake2))
    loss_l1_ref = tF.l1_loss(b_t, fake)
    (loss_g_ref + loss_l1_ref).backward()
    opt_g.step()

    # --- our side --------------------------------------------------------
    cfg = TrainConfig(gen="UNet", nf=nf, batch_size=batch, image_size=size,
                      loss="ls", lambda_a=1.0, lambda_per=0.0, lambda_gp=0.0,
                      no_label_smoothing=True, no_aug=True,
                      compute_dtype="float32", lr=lr, beta1=beta1)
    gen = create_generator("UNet", 3, nf, activation=True)
    disc = create_discriminator("patch", nf, activation=True)
    sched = multistep_lr(lr, cfg.epoch_constant, cfg.total_epochs, 100)
    g_tx, d_tx = make_optimizer(sched, beta1), make_optimizer(sched, beta1)

    ex = jnp.zeros((batch, size, size, 3))
    state = create_train_state(gen, disc, ex, ex, jax.random.key(0), g_tx, d_tx)
    # Tie to the reference's *initial* weights (pre-update).
    ref_g2 = RefUNet(3, 3, nf, activation=True)
    ref_d2 = RefD(3, 3, num_filter=nf, return_filters=False, activation=True)
    randomize_(ref_g2, seed=41)
    randomize_(ref_d2, seed=42)
    state = TrainState(
        g_params={"params": unet_params(ref_g2)},
        d_params={"params": patchdisc_params(ref_d2)},
        g_opt_state=g_tx.init({"params": unet_params(ref_g2)}),
        d_opt_state=d_tx.init({"params": patchdisc_params(ref_d2)}),
        step=jnp.zeros((), jnp.int32),
    )

    step = build_train_step(cfg, gen, disc, g_tx, d_tx)
    state, m = step(state, jnp.asarray(src_u8), jnp.asarray(tgt_u8),
                    jax.random.key(5), apply_gp=False)

    np.testing.assert_allclose(float(m.loss_d), float(loss_d_ref), rtol=1e-4)
    np.testing.assert_allclose(float(m.loss_g), float(loss_g_ref), rtol=1e-4)
    np.testing.assert_allclose(float(m.loss_l1), float(loss_l1_ref), rtol=1e-4)

    # Post-step parameters. Adam's first step is ~ lr*sign(grad), so elements
    # with |grad| near zero amplify reduction-order float noise into up-to-2lr
    # differences. Assert statistically: almost all elements agree tightly,
    # and the mean deviation is a small fraction of lr.
    def assert_updates_close(ours, theirs, label):
        diff = np.abs(np.asarray(ours) - np.asarray(theirs))
        assert diff.mean() < 0.1 * lr, f"{label}: mean diff {diff.mean()}"
        frac_big = float((diff > 0.5 * lr).mean())
        assert frac_big < 0.05, f"{label}: {frac_big:.1%} elements off >lr/2"

    ours_g = jax.device_get(state.g_params)["params"]
    theirs_g = unet_params(ref_g)  # ref_g was updated in place by opt_g.step()
    for path in (("down1", "down", "conv"), ("up7", "refine", "conv"),
                 ("head", "proj")):
        o = ours_g
        t = theirs_g
        for k in path:
            o, t = o[k], t[k]
        assert_updates_close(o["kernel"], t["kernel"], "/".join(path))

    ours_d = jax.device_get(state.d_params)["params"]
    theirs_d = patchdisc_params(ref_d)
    for name in ("block1_conv", "block4_conv", "patch_head"):
        assert_updates_close(ours_d[name]["kernel"], theirs_d[name]["kernel"],
                             name)

    # Second step on the same batch: systematic divergence would compound;
    # float noise stays within a loose relative tolerance.
    fake = ref_g(a_t)
    opt_d.zero_grad()
    pred_fake = ref_d(a_t, fake.detach())
    pred_real = ref_d(a_t, b_t)
    loss_d2 = (tF.mse_loss(pred_fake, torch.zeros_like(pred_fake))
               + tF.mse_loss(pred_real, torch.ones_like(pred_real))) / 2
    loss_d2.backward()
    opt_d.step()
    opt_g.zero_grad()
    pred_fake2 = ref_d(a_t, fake)
    loss_g2 = tF.mse_loss(pred_fake2, torch.ones_like(pred_fake2))
    (loss_g2 + tF.l1_loss(b_t, fake)).backward()
    opt_g.step()

    state, m2 = step(state, jnp.asarray(src_u8), jnp.asarray(tgt_u8),
                     jax.random.key(6), apply_gp=False)
    np.testing.assert_allclose(float(m2.loss_d), float(loss_d2), rtol=2e-2)
    np.testing.assert_allclose(float(m2.loss_g), float(loss_g2), rtol=2e-2)
