"""2x2 stride-2 pooling (NHWC), matching the reference's
nn.AvgPool2d(2,2) (/root/reference/generators/UNet_plusplus.py:41) and
nn.MaxPool2d(2,2) (/root/reference/generators/BCDUNet.py:110).

For even spatial sizes a 2x2/2 window is just a reshape-reduce, which XLA
fuses better than reduce_window on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def avg_pool2(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, f"avg_pool2 needs even H,W, got {x.shape}"
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.mean(x, axis=(2, 4))


def max_pool2(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, f"max_pool2 needs even H,W, got {x.shape}"
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.max(x, axis=(2, 4))
