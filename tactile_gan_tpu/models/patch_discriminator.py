"""Conditional PatchGAN discriminator.

Capability parity with /root/reference/discriminators/PatchDiscriminator.py:
the source and (real or generated) tactile image are concatenated on channels
(6ch at the default 3+3) and pushed through 4 valid-padding conv blocks
(k3: 6→nf s2 biased un-normalized, nf→2nf s2, 2nf→4nf s1, 4nf→8nf s1, each
LeakyReLU(0.2)) and a final k3 valid conv to 1 logit channel, with an optional
Sigmoid. For a 256^2 input the patch map is 57^2 (127→63→61→59→57).

The reference captures the four post-LeakyReLU activations through stateful
forward hooks (PatchDiscriminator.py:18-19,39-43) for the version-2 perceptual
loss; the functional equivalent here is simply returning them. Note the hooks
``.detach()`` the features — the pan-loss consumer applies ``stop_gradient``
to reproduce that semantics (SURVEY.md section 3.6 quirk 2).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tactile_gan_tpu.models.blocks import Conv, InstanceNorm


class PatchDiscriminator(nn.Module):
    nf: int = 64
    activation: bool = True  # final Sigmoid (the reference ties this to the GAN mode)
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, img_a, img_b) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        x = jnp.concatenate([img_a, img_b], axis=-1)
        features = []

        specs = [
            # (width, stride, normalized, biased)
            (self.nf, 2, False, True),
            (self.nf * 2, 2, True, False),
            (self.nf * 4, 1, True, False),
            (self.nf * 8, 1, True, False),
        ]
        for i, (width, stride, normed, biased) in enumerate(specs, start=1):
            x = Conv(width, kernel_size=3, stride=stride, padding=0,
                     use_bias=biased, compute_dtype=self.compute_dtype,
                     name=f"block{i}_conv")(x)
            if normed:
                x = InstanceNorm(act="leaky_relu", use_pallas=self.use_pallas,
                                 name=f"block{i}_norm")(x)
            else:
                x = jax.nn.leaky_relu(x, negative_slope=0.2)
            features.append(x)

        logits = Conv(1, kernel_size=3, stride=1, padding=0, use_bias=True,
                      compute_dtype=self.compute_dtype, name="patch_head")(x)
        logits = logits.astype(jnp.float32)
        if self.activation:
            logits = jax.nn.sigmoid(logits)
        return logits, tuple(features)
