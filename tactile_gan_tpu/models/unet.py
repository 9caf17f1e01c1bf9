"""UNet generator.

Capability parity with /root/reference/generators/UNet.py:55-99: a 7-stage
stride-2 encoder (widths nf, 2nf, 4nf, 8nf, 8nf, 8nf, 8nf — 256px → 2px), a
transposed-conv decoder with skip concatenations, and a 1x1 head with optional
Tanh. NHWC throughout; skip concats happen on the channel (lane) axis.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tactile_gan_tpu.models.blocks import DownBlock, Head, UpBlock


class UNet(nn.Module):
    output_dim: int = 3
    nf: int = 64
    activation: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        if x.shape[1] < 256 or x.shape[2] < 256:
            # 7 stride-2 stages: 128px reaches a 1x1 bottleneck where instance
            # norm is degenerate (output collapses to the learned offset) and
            # the torch reference errors outright (InstanceNorm2d rejects 1x1
            # spatial) — so 256 is the reference's effective minimum.
            raise ValueError(
                f"UNet needs inputs of at least 256x256 (7 stride-2 stages; "
                f"the reference errors below that); got "
                f"{x.shape[1]}x{x.shape[2]}. Use UNet++ or BCDUNet for "
                "smaller images.")
        kw = dict(compute_dtype=self.compute_dtype, use_pallas=self.use_pallas)
        nf = self.nf

        enc_widths = [nf, nf * 2, nf * 4, nf * 8, nf * 8, nf * 8, nf * 8]
        skips = []
        for i, w in enumerate(enc_widths, start=1):
            x = DownBlock(w, name=f"down{i}", **kw)(x)
            skips.append(x)

        x = UpBlock(nf * 8, name="up1", **kw)(skips[-1])
        dec_widths = [nf * 8, nf * 8, nf * 4, nf * 2, nf, nf]
        for i, (w, skip) in enumerate(zip(dec_widths, reversed(skips[:-1])), start=2):
            x = UpBlock(w, name=f"up{i}", **kw)(jnp.concatenate([x, skip], axis=-1))

        return Head(
            self.output_dim, activation=self.activation,
            compute_dtype=self.compute_dtype, name="head",
        )(x)
