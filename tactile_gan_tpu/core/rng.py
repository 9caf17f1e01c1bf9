"""Explicit PRNG-key plumbing.

The reference seeds four global RNGs once at import time
(/root/reference/util.py:8-11, seed 21). The TPU-native determinism story is a
single root ``jax.random`` key threaded through init, augmentation, label
smoothing and gradient-penalty interpolation; every consumer folds in a stable
stream tag so adding a consumer never perturbs the others.
"""

from __future__ import annotations

import jax

# Stable stream tags (arbitrary but fixed integers).
STREAM_PARAMS_G = 0
STREAM_PARAMS_D = 1
STREAM_AUGMENT = 2
STREAM_LABEL_SMOOTHING = 3
STREAM_GP_ALPHA = 4
STREAM_DATA_ORDER = 5


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def stream(key: jax.Array, tag: int) -> jax.Array:
    """A named substream of the root key."""
    return jax.random.fold_in(key, tag)


def per_step(key: jax.Array, step: int) -> jax.Array:
    """Fold a (possibly traced) step counter into a stream key."""
    return jax.random.fold_in(key, step)
