"""WGAN-GP gradient penalty (/root/reference/util.py:72-97).

The reference computes per-sample d(sum D(A, interp))/d(interp) with
torch.autograd.grad(create_graph=True) so the penalty is differentiable wrt D
parameters. The TPU-native form nests jax.grad: the inner grad is wrt the
interpolates; the whole function is itself differentiated wrt ``d_params`` by
the train step's outer jax.grad — second-order autodiff that XLA compiles into
the one train-step program.

Version 2 remaps the mixing coefficient alpha from U[0,1] to U[0.5,1]
(util.py:79-81); alpha is per-sample. The reference's +1e-16 inside the norm
is kept for golden parity.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def gp_interpolates(
    real_mask: jax.Array,
    fake_mask: jax.Array,
    key: jax.Array,
    version: int = 2,
    gp_type: str = "mixed",
) -> jax.Array:
    """The point the penalty differentiates at (util.py:76-84); alpha is
    per batch element, remapped to U[0.5,1] for version 2."""
    if gp_type == "real":
        return real_mask
    if gp_type == "fake":
        return fake_mask
    if gp_type == "mixed":
        b = real_mask.shape[0]
        alpha = jax.random.uniform(key, (b, 1, 1, 1), jnp.float32)
        if version == 2:
            alpha = (alpha + 1.0) / 2.0
        return alpha * real_mask + (1.0 - alpha) * fake_mask
    raise NotImplementedError(f"{gp_type} not implemented")


def gp_penalty(grads: jax.Array, constant: float = 1.0,
               lambda_gp: float = 1.0) -> jax.Array:
    """mean((||grad per sample|| - constant)^2) with the reference's +1e-16
    (util.py:88-93)."""
    flat = (grads + 1e-16).reshape(grads.shape[0], -1)
    norms = jnp.linalg.norm(flat, axis=1)
    return jnp.mean(jnp.square(norms - constant)) * lambda_gp


def gradient_penalty(
    disc_fn: Callable[[jax.Array, jax.Array], jax.Array],
    real_img: jax.Array,
    real_mask: jax.Array,
    fake_mask: jax.Array,
    key: jax.Array,
    version: int = 2,
    gp_type: str = "mixed",
    constant: float = 1.0,
    lambda_gp: float = 1.0,
) -> jax.Array:
    """disc_fn(img, mask) -> patch logits. Returns the scalar penalty.

    All tensors NHWC; alpha is sampled per batch element. The train step's
    fused variant (train/step.py ``gp_fused``) computes the identical
    penalty from a vjp pullback of the stacked 3B-row D forward instead —
    both build on gp_interpolates / gp_penalty so they cannot drift apart.
    """
    interpolates = gp_interpolates(real_mask, fake_mask, key, version,
                                   gp_type)

    def d_sum(interp):
        return jnp.sum(disc_fn(real_img, interp).astype(jnp.float32))

    grads = jax.grad(d_sum)(interpolates)
    return gp_penalty(grads, constant, lambda_gp)
