"""Spatial resize ops (NHWC).

- ``upsample_nearest2`` matches nn.Upsample(scale_factor=2) with the default
  'nearest' mode (/root/reference/generators/UNet_plusplus.py:40).
- ``resize_bilinear`` matches F.interpolate(mode='bilinear',
  align_corners=False) used by the VGG perceptual loss
  (/root/reference/util.py:127-129).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Up2(NamedTuple):
    """Lazy nearest-2x upsample marker: carries the coarse tensor plus the
    logical (upsampled) shape. ``ops.conv.conv2d_multi`` consumes it directly
    — a 3x3/s1/p1 conv on a nearest-2x upsample folds into four 2x2 convs on
    the coarse grid (2.25x fewer FLOPs, no upsampled tensor in HBM)."""

    x: jax.Array

    @property
    def shape(self):
        n, h, w, c = self.x.shape
        return (n, 2 * h, 2 * w, c)

    def materialize(self) -> jax.Array:
        return upsample_nearest2(self.x)


def upsample_nearest2(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsample via broadcast-reshape (layout-friendly on
    TPU: no gather, fuses with the consumer concat/conv)."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def space_to_depth2(x: jax.Array) -> jax.Array:
    """[N, H, W, C] -> [N, H/2, W/2, 4C]: 2x2 pixel blocks fold into channels
    (lane-friendly: quadruples the channel dim the MXU contracts over)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space2(x: jax.Array) -> jax.Array:
    """Inverse of space_to_depth2: [N, H, W, 4C] -> [N, 2H, 2W, C]."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * h, 2 * w, c)


def _axis_weights(in_size: int, out_size: int):
    """Half-pixel-center source indices and lerp weights for one axis."""
    scale = in_size / out_size
    centers = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    centers = jnp.clip(centers, 0.0, in_size - 1)
    lo = jnp.floor(centers).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    frac = centers - lo.astype(jnp.float32)
    return lo, hi, frac


def resize_bilinear(x: jax.Array, size: tuple) -> jax.Array:
    """Bilinear resize with half-pixel centers and NO antialiasing — exactly
    torch F.interpolate(mode='bilinear', align_corners=False). Separable:
    resample H then W with static gathers (jax.image.resize is unsuitable
    here: it antialiases on downscale)."""
    n, h, w, c = x.shape
    oh, ow = size
    x = x.astype(jnp.float32)

    lo, hi, frac = _axis_weights(h, oh)
    x = x[:, lo] * (1.0 - frac)[None, :, None, None] + x[:, hi] * frac[None, :, None, None]

    lo, hi, frac = _axis_weights(w, ow)
    x = x[:, :, lo] * (1.0 - frac)[None, None, :, None] + x[:, :, hi] * frac[None, None, :, None]
    return x
