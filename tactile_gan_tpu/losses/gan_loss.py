"""The four GAN objectives of the reference GANLoss
(/root/reference/generators/generators.py:27-121): 'ls' (MSE), 'ce'
(BCE-with-logits), 'w' (Wasserstein +-mean) and 'hinge', plus one-sided label
smoothing.

Label smoothing in the reference samples one noise tensor on the first batch
and reuses it (expand_as-cached) forever (generators.py:52-63 — SURVEY.md
section 3.6 quirk 3, which also breaks on a smaller final batch). The
TPU-native behavior is fresh per-call noise under an explicit PRNG key; the
distribution, clamp(N(1, 0.02), 0, 1), is identical.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

VALID_MODES = ("ls", "ce", "w", "hinge")


def real_target(
    shape, *, label_smoothing: bool, key: Optional[jax.Array] = None,
) -> jax.Array:
    """Target tensor for "real": smoothed noise around 1.0, or ones."""
    if label_smoothing:
        if key is None:
            raise ValueError("label smoothing needs a PRNG key")
        noise = 1.0 + 0.02 * jax.random.normal(key, shape, jnp.float32)
        return jnp.clip(noise, 0.0, 1.0)
    return jnp.ones(shape, jnp.float32)


def gan_loss(
    logits: jax.Array,
    target_is_real: bool,
    *,
    mode: str,
    for_discriminator: bool = True,
    label_smoothing: bool = False,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Scalar GAN loss for one prediction map.

    ``logits`` is the discriminator output — already sigmoided when the model
    was built with activation=True ('ls' mode), raw otherwise, exactly like
    the reference wires it (/root/reference/train.py:33,41).
    """
    if mode not in VALID_MODES:
        raise ValueError(f"Unexpected gan mode {mode}")

    # Multiscale-discriminator support (reference generators.py:107-121):
    # a list of per-scale predictions (each possibly itself a list whose last
    # entry is the prediction) averages the per-scale losses.
    if isinstance(logits, (list, tuple)):
        per_scale = []
        for i, pred in enumerate(logits):
            if isinstance(pred, (list, tuple)):
                pred = pred[-1]
            per_scale.append(gan_loss(
                pred, target_is_real, mode=mode,
                for_discriminator=for_discriminator,
                label_smoothing=label_smoothing,
                key=None if key is None else jax.random.fold_in(key, i)))
        return sum(per_scale) / len(per_scale)

    x = logits.astype(jnp.float32)

    if mode in ("ls", "ce"):
        if target_is_real:
            target = real_target(x.shape, label_smoothing=label_smoothing, key=key)
        else:
            target = jnp.zeros_like(x)
        if mode == "ls":
            return jnp.mean(jnp.square(x - target))
        # BCE with logits, mean reduction.
        return jnp.mean(
            jnp.maximum(x, 0.0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x))))

    if mode == "hinge":
        if for_discriminator:
            if target_is_real:
                return -jnp.mean(jnp.minimum(x - 1.0, 0.0))
            return -jnp.mean(jnp.minimum(-x - 1.0, 0.0))
        if not target_is_real:
            raise ValueError("The generator's hinge loss must be aiming for real")
        return -jnp.mean(x)

    # Wasserstein.
    return -jnp.mean(x) if target_is_real else jnp.mean(x)
