"""UNet++ generator (the reference default, --gen UNet++).

Capability parity with /root/reference/generators/UNet_plusplus.py:37-86: a
5-level backbone (widths nf..16nf) downsampled by 2x2 average pooling, a dense
grid of nested nodes combined by nearest 2x upsampling + channel concat, and a
1x1 head with optional Tanh.

The reference's nested-node input widths are asymmetric on rows 2-3 (conv2_1
takes 8nf+4nf rather than 4nf+8nf-as-elsewhere etc. — see SURVEY.md C6). In
channel-concat terms the *widths sum identically*; functionally the node is
"concat(all previous nodes at this row, upsample(node below))" and the conv's
input width is whatever that concat produces, which we compute from the data.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tactile_gan_tpu.models.blocks import DoubleConvBlock, Head
from tactile_gan_tpu.ops.pool import avg_pool2
from tactile_gan_tpu.ops.resize import upsample_nearest2


class UNetPlusPlus(nn.Module):
    output_dim: int = 3
    nf: int = 64
    activation: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        kw = dict(compute_dtype=self.compute_dtype, use_pallas=self.use_pallas)
        nf = self.nf
        widths = [nf, nf * 2, nf * 4, nf * 8, nf * 16]

        def block(row, col, h):
            return DoubleConvBlock(widths[row], name=f"node{row}_{col}", **kw)(h)

        # Backbone column 0.
        nodes = {}
        h = x
        for row in range(5):
            if row > 0:
                h = avg_pool2(h)
            h = block(row, 0, h)
            nodes[(row, 0)] = h

        # Nested grid: node(row, col) sees all nodes at its row up to col-1
        # plus the upsampled node one row deeper at col-1.
        for col in range(1, 5):
            for row in range(0, 5 - col):
                inputs = [nodes[(row, c)] for c in range(col)]
                inputs.append(upsample_nearest2(nodes[(row + 1, col - 1)]))
                nodes[(row, col)] = block(row, col, jnp.concatenate(inputs, axis=-1))

        return Head(
            self.output_dim, activation=self.activation,
            compute_dtype=self.compute_dtype, name="head",
        )(nodes[(0, 4)])
