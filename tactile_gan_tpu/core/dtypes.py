"""Mixed-precision policy.

TPU-first convention: parameters and norm/loss arithmetic stay float32,
convolution compute (the MXU work) runs in bfloat16 by default. The reference
is float32 end to end (PyTorch default); ``DTypePolicy(compute=float32)``
reproduces that for parity tests.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Norm statistics and loss reductions always accumulate in float32.
    reduce_dtype: jnp.dtype = jnp.float32


def default_policy(compute: str = "bfloat16") -> DTypePolicy:
    return DTypePolicy(compute_dtype=jnp.dtype(compute))
