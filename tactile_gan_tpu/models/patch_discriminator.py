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

TPU extensions (round 4, both off by default):

- ``resident``: keep the bf16 compute dtype between ops (conv outs, norms,
  LeakyReLU) instead of upcasting to f32 after every conv. The logits head
  always emits f32 (losses + the gradient penalty's norm run in f32).
  Numerics of the second-order GP under bf16 are measured, not assumed —
  drift + quality numbers in BASELINE.md round 4.
- ``same_pad``: SAME-padding VARIANT (changes the network, like
  --space_to_depth): the patch map becomes 64² (256→128→64→64→64) and every
  activation has power-of-two spatial dims — dense (8,128) tiles instead of
  the odd 127²/63²/61²/59² rows that block every packing/tiling trick.
  Checkpoints have identical parameter shapes but train different functions.
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
    resident: bool = False   # bf16-resident activations (see module docstring)
    same_pad: bool = False   # SAME-padding variant (pow2 patch map)

    @nn.compact
    def __call__(self, img_a, img_b) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        x = jnp.concatenate([img_a, img_b], axis=-1)
        features = []
        pad = 1 if self.same_pad else 0

        specs = [
            # (width, stride, normalized, biased)
            (self.nf, 2, False, True),
            (self.nf * 2, 2, True, False),
            (self.nf * 4, 1, True, False),
            (self.nf * 8, 1, True, False),
        ]
        for i, (width, stride, normed, biased) in enumerate(specs, start=1):
            x = Conv(width, kernel_size=3, stride=stride, padding=pad,
                     use_bias=biased, compute_dtype=self.compute_dtype,
                     resident=self.resident, name=f"block{i}_conv")(x)
            if normed:
                # use_pallas stays off here even when the caller enables it
                # for the generator: the gradient penalty differentiates the
                # discriminator TWICE, and the fused Pallas norm is
                # first-order-only (its VJP asserts under reverse-over-
                # reverse). On the faithful valid-pad shapes the kernel's
                # non-pow2 fallback made this moot; the same_pad variant's
                # pow2 shapes would otherwise engage it and break GP.
                x = InstanceNorm(act="leaky_relu", use_pallas=False,
                                 name=f"block{i}_norm")(x)
            else:
                x = jax.nn.leaky_relu(x, negative_slope=0.2)
            features.append(x)

        logits = Conv(1, kernel_size=3, stride=1, padding=pad, use_bias=True,
                      compute_dtype=self.compute_dtype, name="patch_head")(x)
        logits = logits.astype(jnp.float32)
        if self.activation:
            logits = jax.nn.sigmoid(logits)
        return logits, tuple(features)
