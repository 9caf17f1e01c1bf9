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
from tactile_gan_tpu.ops.resize import (
    Up2, depth_to_space2, space_to_depth2, upsample_nearest2,
)


class UNetPlusPlus(nn.Module):
    """``space_to_depth=True`` is a TPU-performance VARIANT (off by default;
    --space_to_depth): the full-resolution row runs in 2x2-folded space
    (H/2 x W/2 x 4C), quartering the row-0 conv FLOPs and feeding the MXU
    4x-wider channels, with a depth-to-space unfold before the head. It
    CHANGES the network (different receptive fields at row 0), so checkpoints
    and parity are per-variant — see BASELINE.md for measurements."""

    output_dim: int = 3
    nf: int = 64
    activation: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # Exact w-packed row-0 convs (ops/conv.py _pack2_w): two output columns
    # per MXU window so the cout<=64 convs fill all 128 output lanes. Same
    # parameters, same numerics; flag is perf-only (BASELINE.md round 3).
    lane_pack: bool = False
    space_to_depth: bool = False
    # Feed each nested node's first conv the un-concatenated input list
    # (ops.conv2d_multi): numerically the same conv with the same parameters,
    # but the wide concat tensors never round-trip HBM.
    split_concat: bool = True
    # bf16-resident rows: conv outputs and norms keep the compute dtype
    # between ops, halving their HBM traffic. Round 3 shipped it for the
    # deep rows only (b16 XLA step 92.4 -> 99.3); round 4 extended it to
    # ROW 0 as well (the round-1 "narrow-C bf16 slower" result predated the
    # split_concat/up-conv rewrites — re-measured b16 XLA 95.1 -> 99.5) and
    # made the fused Pallas norms bf16-capable so it composes with the b4
    # pallas path too. A packed row 0 ignores this flag (the packed layout
    # is bf16-resident whenever compute is bf16, its own measured contract).
    bf16_resident: bool = False
    # Keep the full-resolution row RESIDENT in the w-pair packed layout
    # (ops/packed_row.py): dense 128-lane tiles for the cout=nf<=64 convs
    # (Pallas kernel, 2.3x XLA on v5e) and free packed-space instance norms.
    # Exact same network and parameters — checkpoints are interchangeable —
    # unlike the --space_to_depth VARIANT. Requires nf <= 64, split_concat,
    # and no space_to_depth.
    packed_row0: bool = False

    @nn.compact
    def __call__(self, x):
        kw = dict(compute_dtype=self.compute_dtype, use_pallas=self.use_pallas,
                  lane_pack=self.lane_pack)
        nf = self.nf
        s2d = self.space_to_depth
        packed0 = self.packed_row0
        if packed0 and (s2d or not self.split_concat or 2 * nf > 128):
            raise ValueError(
                "packed_row0 needs split_concat, nf <= 64, and no "
                "space_to_depth")
        if packed0:
            from tactile_gan_tpu.ops.packed_row import avg_pool2_packed
        widths = [2 * nf if s2d else nf, nf * 2, nf * 4, nf * 8, nf * 16]
        if s2d:
            if nf % 2:
                raise ValueError("space_to_depth needs an even nf (the row-0 "
                                 "width 2*nf must unfold by 4 at the head)")
            # Row 0 runs in 2x2-folded space: stored H/2 x W/2 x 2nf, read as
            # logical H x W x nf/2. Same conv FLOPs as the unfolded row at
            # half the spatial iterations and double the lane occupancy.
            x = space_to_depth2(x)

        def block(row, col, h):
            return DoubleConvBlock(widths[row], name=f"node{row}_{col}",
                                   packed=(packed0 and row == 0),
                                   resident=self.bf16_resident,
                                   **kw)(h)

        def pool_row0(h):
            # Logical avg_pool2 of the folded row-0 tensor = mean over the
            # four 2x2-position channel groups (no spatial op needed).
            n_, hh, ww, c = h.shape
            return h.reshape(n_, hh, ww, 4, c // 4).mean(axis=3)

        # Backbone column 0.
        nodes = {}
        h = x
        for row in range(5):
            if row == 1 and s2d:
                h = pool_row0(h)
            elif row == 1 and packed0:
                # Same mean over the same four elements, bitcast reshape
                # instead of the unpack's layout copy (see avg_pool2_packed).
                h = avg_pool2_packed(h)
            elif row > 0:
                h = avg_pool2(h)
            h = block(row, 0, h)
            nodes[(row, 0)] = h

        # Nested grid: node(row, col) sees all nodes at its row up to col-1
        # plus the upsampled node one row deeper at col-1. In s2d mode the
        # row-1 node is already spatially aligned with folded row 0, so it is
        # concatenated directly (each logical 2x2 block reads the feature
        # once — cheaper than the faithful 4x channel-tile, same information).
        for col in range(1, 5):
            for row in range(0, 5 - col):
                inputs = [nodes[(row, c)] for c in range(col)]
                below = nodes[(row + 1, col - 1)]
                if row == 0 and s2d:
                    inputs.append(below)
                elif self.split_concat:
                    # Lazy upsample: conv2d_multi folds the 3x3 conv onto the
                    # coarse grid (2.25x fewer FLOPs for this piece, and the
                    # upsampled tensor never exists in HBM).
                    inputs.append(Up2(below))
                else:
                    inputs.append(upsample_nearest2(below))
                joined = (list(inputs) if self.split_concat
                          else jnp.concatenate(inputs, axis=-1))
                nodes[(row, col)] = block(row, col, joined)

        out = nodes[(0, 4)]
        if s2d:
            out = depth_to_space2(out)  # back to H x W x nf/2 for the head
        return Head(
            self.output_dim, activation=self.activation,
            compute_dtype=self.compute_dtype, name="head",
        )(out)
