"""End-to-end one-step training parity vs the PyTorch reference, for ALL
three generator families.

Ties the reference models' weights into our flax params, runs full G+D train
steps on both sides with identical deterministic settings (no augmentation,
no label smoothing, no GP — the RNG-free subset), and checks losses and
post-Adam parameter updates agree. This pins down the whole chain:
preprocessing, forwards, loss arithmetic, both backward passes, and the
optimizer (betas=(0.9, 0.99), reference /root/reference/train.py:56-57).
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
from tactile_gan_tpu.train.state import TrainState, make_optimizer
from tactile_gan_tpu.train.step import build_train_step

from torch_ref import (
    bcdunet_params, patchdisc_params, randomize_, unet_params, unetpp_params,
)

RNG = np.random.default_rng(31)

LR, BETA1 = 1e-3, 0.9


def _make_ref_gen(gen_name, nf, size):
    if gen_name == "UNet":
        from generators.UNet import UNet as RefUNet
        return RefUNet(3, 3, nf, activation=True), unet_params
    if gen_name == "UNet++":
        from generators.UNet_plusplus import UNet_plusplus as RefUNetPP
        return RefUNetPP(3, 3, nf, activation=True), unetpp_params
    from generators.BCDUNet import BCDUNet as RefBCDUNet
    return (RefBCDUNet(3, 3, nf, frame_size=(size, size), bidirectional=True,
                       activation=True), bcdunet_params)


def _torch_step(ref_g, ref_d, opt_g, opt_d, a_t, b_t):
    """One reference-loop iteration (/root/reference/train.py:99-168),
    ls mode without smoothing/GP/perceptual. Returns (loss_d, loss_g, l1)."""
    fake = ref_g(a_t)
    opt_d.zero_grad()
    pred_fake = ref_d(a_t, fake.detach())
    pred_real = ref_d(a_t, b_t)
    loss_d = (tF.mse_loss(pred_fake, torch.zeros_like(pred_fake))
              + tF.mse_loss(pred_real, torch.ones_like(pred_real))) / 2
    loss_d.backward()
    opt_d.step()
    opt_g.zero_grad()
    pred_fake2 = ref_d(a_t, fake)
    loss_g = tF.mse_loss(pred_fake2, torch.ones_like(pred_fake2))
    loss_l1 = tF.l1_loss(b_t, fake)
    (loss_g + loss_l1).backward()
    opt_g.step()
    return float(loss_d), float(loss_g), float(loss_l1)


@pytest.mark.parametrize("gen_name,size", [
    ("UNet", 256),     # the 7-stage UNet needs >1 px at its bottleneck
    ("UNet++", 64),
    ("BCDUNet", 64),
])
def test_one_train_step_matches_reference(reference_available, gen_name, size):
    if not reference_available:
        pytest.skip("reference checkout unavailable")
    from discriminators.PatchDiscriminator import PatchDiscriminator as RefD

    nf, batch = 4, 1

    # --- reference side ---------------------------------------------------
    ref_g, to_params = _make_ref_gen(gen_name, nf, size)
    ref_d = RefD(3, 3, num_filter=nf, return_filters=False, activation=True)
    randomize_(ref_g, seed=41)
    randomize_(ref_d, seed=42)
    opt_g = torch.optim.Adam(ref_g.parameters(), lr=LR, betas=(BETA1, 0.99))
    opt_d = torch.optim.Adam(ref_d.parameters(), lr=LR, betas=(BETA1, 0.99))

    src_u8 = RNG.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    tgt_u8 = RNG.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    a_t = torch.tensor(
        (src_u8.astype(np.float32) / 255.0 * 2 - 1).transpose(0, 3, 1, 2))
    b_t = torch.tensor((tgt_u8.astype(np.float32) / 255.0).transpose(0, 3, 1, 2))

    loss_d_ref, loss_g_ref, loss_l1_ref = _torch_step(
        ref_g, ref_d, opt_g, opt_d, a_t, b_t)

    # --- our side ----------------------------------------------------------
    cfg = TrainConfig(gen=gen_name, nf=nf, batch_size=batch, image_size=size,
                      loss="ls", lambda_a=1.0, lambda_per=0.0, lambda_gp=0.0,
                      no_label_smoothing=True, no_aug=True,
                      compute_dtype="float32", lr=LR, beta1=BETA1)
    gen = create_generator(gen_name, 3, nf, activation=True)
    disc = create_discriminator("patch", nf, activation=True)
    sched = multistep_lr(LR, cfg.epoch_constant, cfg.total_epochs, 100)
    g_tx, d_tx = make_optimizer(sched, BETA1), make_optimizer(sched, BETA1)

    # Tie to the reference's *initial* weights (pre-update).
    ref_g2, _ = _make_ref_gen(gen_name, nf, size)
    ref_d2 = RefD(3, 3, num_filter=nf, return_filters=False, activation=True)
    randomize_(ref_g2, seed=41)
    randomize_(ref_d2, seed=42)
    g0 = {"params": to_params(ref_g2)}
    d0 = {"params": patchdisc_params(ref_d2)}
    state = TrainState(g_params=g0, d_params=d0, g_opt_state=g_tx.init(g0),
                       d_opt_state=d_tx.init(d0),
                       step=jnp.zeros((), jnp.int32))

    step = build_train_step(cfg, gen, disc, g_tx, d_tx)
    state, m = step(state, jnp.asarray(src_u8), jnp.asarray(tgt_u8),
                    jax.random.key(5), apply_gp=False)

    np.testing.assert_allclose(float(m.loss_d), loss_d_ref, rtol=1e-4)
    np.testing.assert_allclose(float(m.loss_g), loss_g_ref, rtol=1e-4)
    np.testing.assert_allclose(float(m.loss_l1), loss_l1_ref, rtol=1e-4)

    # Post-step parameters. Adam's first step is ~ lr*sign(grad), so elements
    # with |grad| near zero amplify reduction-order float noise into up-to-2lr
    # differences. Assert statistically: almost all elements agree tightly,
    # and the mean deviation is a small fraction of lr.
    def assert_updates_close(ours, theirs, label):
        diff = np.abs(np.asarray(ours) - np.asarray(theirs))
        assert diff.mean() < 0.1 * LR, f"{label}: mean diff {diff.mean()}"
        frac_big = float((diff > 0.5 * LR).mean())
        assert frac_big < 0.05, f"{label}: {frac_big:.1%} elements off >lr/2"

    ours_g = jax.device_get(state.g_params)["params"]
    theirs_g = to_params(ref_g)  # updated in place by opt_g.step()

    def leaves_of(t):
        out = {}

        def rec(node, prefix):
            if isinstance(node, dict):
                for k, v in node.items():
                    rec(v, prefix + (k,))
            else:
                out["/".join(prefix)] = node

        rec(t, ())
        return out

    lo, lt = leaves_of(ours_g), leaves_of(theirs_g)
    assert set(lo) == set(lt)
    # Per-leaf stats are meaningless for tiny bias vectors; check each large
    # tensor individually plus all generator params pooled.
    for name in lo:
        if np.asarray(lo[name]).size >= 256:
            assert_updates_close(lo[name], lt[name], f"G {name}")
    pooled_o = np.concatenate([np.asarray(lo[n]).ravel() for n in sorted(lo)])
    pooled_t = np.concatenate([np.asarray(lt[n]).ravel() for n in sorted(lt)])
    assert_updates_close(pooled_o, pooled_t, "G pooled")

    ours_d = jax.device_get(state.d_params)["params"]
    theirs_d = patchdisc_params(ref_d)
    for name in ("block1_conv", "block4_conv", "patch_head"):
        assert_updates_close(ours_d[name]["kernel"], theirs_d[name]["kernel"],
                             name)

    # Second step on the same batch: systematic divergence would compound;
    # float noise stays within a loose relative tolerance.
    loss_d2, loss_g2, _ = _torch_step(ref_g, ref_d, opt_g, opt_d, a_t, b_t)
    state, m2 = step(state, jnp.asarray(src_u8), jnp.asarray(tgt_u8),
                     jax.random.key(6), apply_gp=False)
    np.testing.assert_allclose(float(m2.loss_d), loss_d2, rtol=2e-2)
    np.testing.assert_allclose(float(m2.loss_g), loss_g2, rtol=2e-2)


# ---------------------------------------------------------------------------
# Legacy cached label smoothing (--legacy_label_cache): the reference samples
# the real-target noise ONCE and reuses it for every batch
# (/root/reference/generators/generators.py:52-63).
# ---------------------------------------------------------------------------

def _smoothing_setup(legacy: bool, nf=4, size=64, batch=1):
    cfg = TrainConfig(gen="UNet++", nf=nf, batch_size=batch, image_size=size,
                      loss="ls", lambda_a=1.0, lambda_per=0.0, lambda_gp=0.0,
                      no_label_smoothing=False, legacy_label_cache=legacy,
                      no_aug=True, compute_dtype="float32", lr=LR, beta1=BETA1)
    gen = create_generator("UNet++", 3, nf, activation=True)
    disc = create_discriminator("patch", nf, activation=True)
    sched = multistep_lr(LR, cfg.epoch_constant, cfg.total_epochs, 100)
    g_tx, d_tx = make_optimizer(sched, BETA1), make_optimizer(sched, BETA1)
    from tactile_gan_tpu.train.state import create_train_state
    ex = jnp.zeros((batch, size, size, 3), jnp.float32)
    state = create_train_state(gen, disc, ex, ex, jax.random.key(3), g_tx, d_tx)
    step = build_train_step(cfg, gen, disc, g_tx, d_tx)
    return state, step


@pytest.mark.parametrize("legacy", [True, False])
def test_legacy_label_cache_noise_reuse(legacy):
    """With the legacy flag the smoothing noise ignores the step counter, so
    identical params+batch at different step counts give identical D losses;
    fresh-noise mode must differ."""
    state, step = _smoothing_setup(legacy)
    src = RNG.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    tgt = RNG.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    key = jax.random.key(11)

    # The step donates its state argument — make an independent copy first.
    state7 = jax.tree.map(jnp.array, state).replace(
        step=jnp.asarray(7, jnp.int32))
    _, m0 = step(state, jnp.asarray(src), jnp.asarray(tgt), key, apply_gp=False)
    _, m7 = step(state7, jnp.asarray(src), jnp.asarray(tgt), key, apply_gp=False)

    if legacy:
        assert float(m0.loss_d) == float(m7.loss_d)
    else:
        assert float(m0.loss_d) != float(m7.loss_d)


def test_legacy_label_cache_matches_reference_exactly(reference_available,
                                                      monkeypatch):
    """2-step smoothed training parity: inject the reference's one cached
    noise draw into our real_target and require EXACT loss agreement — the
    cached-tensor reuse (not just the distribution) is what's under test."""
    if not reference_available:
        pytest.skip("reference checkout unavailable")
    from discriminators.PatchDiscriminator import PatchDiscriminator as RefD
    from generators.generators import GANLoss as RefGANLoss
    from generators.UNet_plusplus import UNet_plusplus as RefUNetPP

    nf, size, batch = 4, 64, 1

    ref_g = RefUNetPP(3, 3, nf, activation=True)
    ref_d = RefD(3, 3, num_filter=nf, return_filters=False, activation=True)
    randomize_(ref_g, seed=41)
    randomize_(ref_d, seed=42)
    opt_g = torch.optim.Adam(ref_g.parameters(), lr=LR, betas=(BETA1, 0.99))
    opt_d = torch.optim.Adam(ref_d.parameters(), lr=LR, betas=(BETA1, 0.99))

    gl = RefGANLoss("ls", label_smoothing=True)
    # The reference hardcodes device='cuda' for the FAKE label tensor
    # (generators.py:67); pre-seed it on CPU so the smoothing path (which is
    # device-agnostic, generators.py:54-57) can run here.
    gl.fake_label_tensor = torch.tensor([0.0], dtype=torch.float32)
    gl.fake_label_tensor.requires_grad_(False)

    src_u8 = RNG.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    tgt_u8 = RNG.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    a_t = torch.tensor(
        (src_u8.astype(np.float32) / 255.0 * 2 - 1).transpose(0, 3, 1, 2))
    b_t = torch.tensor((tgt_u8.astype(np.float32) / 255.0).transpose(0, 3, 1, 2))

    torch.manual_seed(99)

    def ref_step():
        fake = ref_g(a_t)
        opt_d.zero_grad()
        pred_fake = ref_d(a_t, fake.detach())
        pred_real = ref_d(a_t, b_t)
        loss_d = (gl(pred_fake, False, True) + gl(pred_real, True, True)) / 2
        loss_d.backward()
        opt_d.step()
        opt_g.zero_grad()
        pred_fake2 = ref_d(a_t, fake)
        loss_g = gl(pred_fake2, True, False).mean()
        loss_l1 = tF.l1_loss(b_t, fake)
        (loss_g + loss_l1).backward()
        opt_g.step()
        return float(loss_d), float(loss_g)

    ref_losses = [ref_step(), ref_step()]
    # The one-and-only noise draw, cached after step 1 and reused in step 2.
    noise = gl.real_label_tensor.detach().numpy().transpose(0, 2, 3, 1)

    # --- our side: same initial weights, legacy cache on, noise injected ----
    import importlib
    # `tactile_gan_tpu.losses.__init__` re-exports the gan_loss FUNCTION,
    # shadowing the submodule on attribute lookup — resolve the module itself.
    gl_mod = importlib.import_module("tactile_gan_tpu.losses.gan_loss")

    def injected_real_target(shape, *, label_smoothing, key=None):
        assert label_smoothing and shape == noise.shape
        return jnp.asarray(noise)

    monkeypatch.setattr(gl_mod, "real_target", injected_real_target)

    cfg = TrainConfig(gen="UNet++", nf=nf, batch_size=batch, image_size=size,
                      loss="ls", lambda_a=1.0, lambda_per=0.0, lambda_gp=0.0,
                      no_label_smoothing=False, legacy_label_cache=True,
                      no_aug=True, compute_dtype="float32", lr=LR, beta1=BETA1)
    gen = create_generator("UNet++", 3, nf, activation=True)
    disc = create_discriminator("patch", nf, activation=True)
    sched = multistep_lr(LR, cfg.epoch_constant, cfg.total_epochs, 100)
    g_tx, d_tx = make_optimizer(sched, BETA1), make_optimizer(sched, BETA1)

    ref_g2 = RefUNetPP(3, 3, nf, activation=True)
    ref_d2 = RefD(3, 3, num_filter=nf, return_filters=False, activation=True)
    randomize_(ref_g2, seed=41)
    randomize_(ref_d2, seed=42)
    g0 = {"params": unetpp_params(ref_g2)}
    d0 = {"params": patchdisc_params(ref_d2)}
    state = TrainState(g_params=g0, d_params=d0, g_opt_state=g_tx.init(g0),
                       d_opt_state=d_tx.init(d0),
                       step=jnp.zeros((), jnp.int32))
    step = build_train_step(cfg, gen, disc, g_tx, d_tx)

    state, m1 = step(state, jnp.asarray(src_u8), jnp.asarray(tgt_u8),
                     jax.random.key(5), apply_gp=False)
    state, m2 = step(state, jnp.asarray(src_u8), jnp.asarray(tgt_u8),
                     jax.random.key(5), apply_gp=False)

    np.testing.assert_allclose(float(m1.loss_d), ref_losses[0][0], rtol=1e-4)
    np.testing.assert_allclose(float(m1.loss_g), ref_losses[0][1], rtol=1e-4)
    # Step 2 compounds step 1's Adam float noise through the params; the
    # losses themselves are still compared directly (not statistically).
    np.testing.assert_allclose(float(m2.loss_d), ref_losses[1][0], rtol=2e-2)
    np.testing.assert_allclose(float(m2.loss_g), ref_losses[1][1], rtol=2e-2)
