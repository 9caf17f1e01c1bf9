"""Instance normalization (NHWC).

Matches nn.InstanceNorm2d semantics as the reference uses it:

- generator blocks: affine=True, track_running_stats=False, eps=1e-5
  (/root/reference/generators/UNet.py:22,26)
- BCDUNet conv blocks: affine=False (/root/reference/generators/BCDUNet.py:123)
- PyTorch normalizes by the *biased* variance over (H, W) per (N, C).

Statistics always accumulate in float32 regardless of the activation dtype.
An optional fused Pallas kernel (ops.pallas.instance_norm) implements
norm+activation in one VMEM pass; this module is the XLA fallback and the
numerical reference for it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def instance_norm(
    x: jax.Array,
    scale: Optional[jax.Array] = None,
    offset: Optional[jax.Array] = None,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    """x: [N,H,W,C]; scale/offset: [C] or None (non-affine)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    y = (x32 - mean) * inv
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if offset is not None:
        y = y + offset.astype(jnp.float32)
    return y.astype(x.dtype) if x.dtype != jnp.float32 else y
