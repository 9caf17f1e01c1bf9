"""The single jitted G+D train step.

One compiled XLA program covers everything the reference does per iteration
(/root/reference/train.py:99-168): on-device preprocessing/augmentation, the
generator forward, three discriminator forwards (fake-detached, real, and the
post-update fake for G), the optional gradient penalty (second-order), both
backward passes and both Adam updates — versus the reference's eager graph
with 5 host syncs per iteration (SURVEY.md section 3.1). Losses come back as
a stacked device array fetched once per epoch.

The ``reg_every`` gradient-penalty gating is per *epoch*
(/root/reference/train.py:123); it is a static argument, so XLA compiles two
step variants (GP on/off) and the loop picks one per epoch.

Reference-faithful details:
- D loss = (fake + real)/2; GP added on top (train.py:114-128).
- The G step scores fake images against the *updated* discriminator
  (train.py:135-140), as does the version-2 real-feature pass (train.py:156).
- One label-smoothing noise draw per step, shared by the D-real target and
  the G target (the reference caches one tensor and reuses it for both —
  generators.py:52-63; we re-sample per step under a PRNG key, SURVEY quirk 3).
- Version-2 perceptual features are stop_gradient-ed on both sides, so the
  term is logged but (like the reference's detached hooks) trains nothing
  (SURVEY quirk 2). Set ``detach_pan_features=False`` to make it train.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from tactile_gan_tpu.core import rng as rng_streams
from tactile_gan_tpu.core.config import TrainConfig
from tactile_gan_tpu.data.augment import preprocess_batch
from tactile_gan_tpu.losses.gan_loss import gan_loss
from tactile_gan_tpu.losses.gradient_penalty import (
    gp_interpolates, gp_penalty, gradient_penalty,
)
from tactile_gan_tpu.losses.perceptual import l1_loss, pan_loss, vgg_perceptual_loss
from tactile_gan_tpu.train.state import TrainState


class StepMetrics(NamedTuple):
    loss_d: jax.Array
    loss_g: jax.Array
    loss_l1: jax.Array
    loss_gp: jax.Array
    loss_per: jax.Array


def build_train_step(
    cfg: TrainConfig,
    gen_model,
    disc_model,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    vgg_apply: Optional[Callable] = None,
    vgg_params=None,
    detach_pan_features: bool = True,
):
    """Returns train_step(state, src_u8, tgt_u8, key, *, apply_gp) (jitted)."""

    # With --host_aug the flip/affine already happened in the decode pool
    # (data/host_aug.py); the step only normalizes.
    augment = not cfg.no_aug and not cfg.host_aug
    mode = cfg.loss
    smoothing = cfg.label_smoothing
    gp_fused = cfg.effective_gp_fused()

    def disc_logits(d_params, img, mask):
        logits, _ = disc_model.apply(d_params, img, mask)
        return logits

    def _step(state: TrainState, src_u8, tgt_u8, key, apply_gp: bool):
        k_step = rng_streams.per_step(key, state.step)
        k_aug = rng_streams.stream(k_step, rng_streams.STREAM_AUGMENT)
        if cfg.legacy_label_cache:
            # Reference quirk mode: one noise draw reused for every step of
            # the run (generators.py:52-63) — the key ignores the step
            # counter, so the same clamp(N(1,.02)) tensor reappears each
            # batch, shared by the D-real and G targets like the reference's
            # cached expand_as tensor.
            k_label = rng_streams.stream(key, rng_streams.STREAM_LABEL_SMOOTHING)
        else:
            k_label = rng_streams.stream(k_step,
                                         rng_streams.STREAM_LABEL_SMOOTHING)
        k_gp = rng_streams.stream(k_step, rng_streams.STREAM_GP_ALPHA)

        real_a, real_b = preprocess_batch(src_u8, tgt_u8, k_aug, augment=augment)

        # Generator forward exactly ONCE via jax.vjp: the D step consumes the
        # value, the G step pulls its parameter gradients back through the
        # saved linearization — the same forward-graph reuse the reference
        # gets from retain_graph (XLA does not CSE a duplicated forward
        # across the two grad regions; this saves a full G forward per step).
        fake_b, g_pullback = jax.vjp(
            lambda p: gen_model.apply(p, real_a), state.g_params)

        # ---------------- D update ----------------
        batch = real_a.shape[0]

        def d_loss_fn(d_params):
            # One batched D forward covers fake and real: instance norm and
            # every other op in the PatchGAN are per-sample, so stacking on
            # the batch axis is exact and feeds the MXU twice the work per
            # kernel (the reference runs two separate forwards,
            # /root/reference/train.py:110-111).
            fake_det = jax.lax.stop_gradient(fake_b)
            want_gp = apply_gp and cfg.lambda_gp != 0
            if want_gp and gp_fused:
                # Fused-GP form: the interpolates ride the SAME stacked D
                # forward as fake/real (a third batch of rows), and the GP's
                # inner gradient comes from the vjp pullback of that one
                # forward — one 3B-row conv chain instead of a 2B-row chain
                # plus a separate B-row chain inside jax.grad. Exact: every
                # discriminator op is per-sample, so each row's logits (and
                # the pullback restricted to the interp rows, whose
                # cotangent is the gp's d sum(D)/d logits = 1) are
                # identical to the unfused form's. Second-order (the outer
                # grad wrt d_params) differentiates through the pullback
                # exactly like the nested-jax.grad form.
                interp = gp_interpolates(real_b, fake_det, k_gp,
                                         version=cfg.version)
                stacked_img = jnp.concatenate([real_a, real_a, real_a],
                                              axis=0)
                stacked_mask = jnp.concatenate([fake_det, real_b, interp],
                                               axis=0)

                def fwd_mask(m):
                    out, _ = disc_model.apply(d_params, stacked_img, m)
                    return out.astype(jnp.float32)

                stacked_pred, pullback = jax.vjp(fwd_mask, stacked_mask)
                cot = jnp.concatenate(
                    [jnp.zeros((2 * batch,) + stacked_pred.shape[1:],
                               stacked_pred.dtype),
                     jnp.ones((batch,) + stacked_pred.shape[1:],
                              stacked_pred.dtype)], axis=0)
                (grad_mask,) = pullback(cot)
                gp = gp_penalty(grad_mask[2 * batch:],
                                lambda_gp=cfg.lambda_gp)
            else:
                stacked_pred, _ = disc_model.apply(
                    d_params,
                    jnp.concatenate([real_a, real_a], axis=0),
                    jnp.concatenate([fake_det, real_b], axis=0))
                if want_gp:
                    gp = gradient_penalty(
                        functools.partial(disc_logits, d_params),
                        real_a, real_b, fake_det, k_gp,
                        version=cfg.version, lambda_gp=cfg.lambda_gp)
                else:
                    gp = jnp.float32(0.0)
            pred_fake = stacked_pred[:batch]
            pred_real = stacked_pred[batch:2 * batch]
            loss_fake = gan_loss(pred_fake, False, mode=mode,
                                 for_discriminator=True)
            loss_real = gan_loss(pred_real, True, mode=mode,
                                 for_discriminator=True,
                                 label_smoothing=smoothing, key=k_label)
            loss_d = (loss_fake + loss_real) / 2.0
            return loss_d + gp, (loss_d, gp)

        (_, (loss_d, gp)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state,
                                             state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---------------- G update (against the updated D) ----------------
        # Differentiate the G objective wrt the generator *output*, then pull
        # back through the single saved forward.
        def g_loss_fn(fake):
            want_pan = cfg.lambda_per != 0 and cfg.version == 2
            if want_pan:
                # Version 2 needs D features of the REAL pair too
                # (train.py:156). Stack it into the same D forward as the
                # fake — per-sample ops make the 2B-row call exact, and the
                # MXU sees one chain of double-width convs instead of two
                # half-filled ones.
                stacked_pred, stacked_feats = disc_model.apply(
                    d_params,
                    jnp.concatenate([real_a, real_a], axis=0),
                    jnp.concatenate([fake, real_b], axis=0))
                pred_fake = stacked_pred[:batch]
                feats_fake = tuple(f[:batch] for f in stacked_feats)
                feats_real = tuple(f[batch:] for f in stacked_feats)
            else:
                pred_fake, feats_fake = disc_model.apply(d_params, real_a,
                                                         fake)
            loss_gan = gan_loss(pred_fake, True, mode=mode,
                                for_discriminator=False,
                                label_smoothing=smoothing, key=k_label)
            loss_l1 = l1_loss(real_b, fake)
            loss_g = loss_gan + loss_l1 * cfg.lambda_a

            loss_per = jnp.float32(0.0)
            if cfg.lambda_per != 0:
                if cfg.version == 1:
                    loss_per = vgg_perceptual_loss(
                        vgg_apply, vgg_params, real_b, fake,
                        weights=cfg.w_per) * cfg.lambda_per
                else:
                    if detach_pan_features:
                        feats_fake_used = jax.tree.map(jax.lax.stop_gradient,
                                                       feats_fake)
                    else:
                        feats_fake_used = feats_fake
                    feats_real = jax.tree.map(jax.lax.stop_gradient, feats_real)
                    loss_per = pan_loss(feats_real, feats_fake_used,
                                        weights=cfg.w_per) * cfg.lambda_per
                loss_g = loss_g + loss_per
            return loss_g, (loss_gan, loss_l1, loss_per)

        (_, (loss_gan, loss_l1, loss_per)), fake_grad = jax.value_and_grad(
            g_loss_fn, has_aux=True)(fake_b)
        (g_grads,) = g_pullback(fake_grad)
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state,
                                             state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = TrainState(
            g_params=g_params, d_params=d_params,
            g_opt_state=g_opt_state, d_opt_state=d_opt_state,
            step=state.step + 1,
        )
        metrics = StepMetrics(loss_d=loss_d, loss_g=loss_gan, loss_l1=loss_l1,
                              loss_gp=gp, loss_per=loss_per)
        return new_state, metrics

    return jax.jit(_step, static_argnames=("apply_gp",), donate_argnums=(0,))
