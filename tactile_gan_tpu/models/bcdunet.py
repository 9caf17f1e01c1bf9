"""BCDUNet generator — the *effective* network.

Capability parity with /root/reference/generators/BCDUNet.py:106-181. The
reference constructs ConvLSTM/ConvBLSTM stacks and a dropout layer that its
forward pass never calls (SURVEY.md section 3.6 quirk 1); we implement only the
live dataflow: a 4-level UNet with max-pool downsampling, k2/s2 transposed-conv
upsampling, skip concats, and a 1x1 head with optional Tanh.

Reference-specific details kept: conv blocks use biased convs and *non-affine*
instance norm (/root/reference/generators/BCDUNet.py:120-128); the up-convs are
kernel 2, stride 2, padding 0 with bias (/root/reference/generators/BCDUNet.py:135-137).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tactile_gan_tpu.models.blocks import ConvTranspose, DoubleConvBlock, Head
from tactile_gan_tpu.ops.pool import max_pool2


class BCDUNet(nn.Module):
    output_dim: int = 3
    nf: int = 64
    activation: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        kw = dict(
            use_bias=True, affine_norm=False,
            compute_dtype=self.compute_dtype, use_pallas=self.use_pallas,
        )
        nf = self.nf

        e1 = DoubleConvBlock(nf, name="enc1", **kw)(x)
        e2 = DoubleConvBlock(nf * 2, name="enc2", **kw)(max_pool2(e1))
        e3 = DoubleConvBlock(nf * 4, name="enc3", **kw)(max_pool2(e2))
        bottleneck = DoubleConvBlock(nf * 8, name="enc4", **kw)(max_pool2(e3))

        d3 = ConvTranspose(nf * 4, kernel_size=2, stride=2, padding=0,
                           use_bias=True, compute_dtype=self.compute_dtype,
                           name="up3")(bottleneck)
        d3 = DoubleConvBlock(nf * 4, name="dec3", **kw)(
            jnp.concatenate([e3, d3], axis=-1))

        d2 = ConvTranspose(nf * 2, kernel_size=2, stride=2, padding=0,
                           use_bias=True, compute_dtype=self.compute_dtype,
                           name="up2")(d3)
        d2 = DoubleConvBlock(nf * 2, name="dec2", **kw)(
            jnp.concatenate([e2, d2], axis=-1))

        d1 = ConvTranspose(nf, kernel_size=2, stride=2, padding=0,
                           use_bias=True, compute_dtype=self.compute_dtype,
                           name="up1")(d2)
        d1 = DoubleConvBlock(nf, name="dec1", **kw)(
            jnp.concatenate([e1, d1], axis=-1))

        return Head(
            self.output_dim, activation=self.activation,
            compute_dtype=self.compute_dtype, name="head",
        )(d1)
