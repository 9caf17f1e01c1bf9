"""Training state: one pytree carrying both networks and both optimizers.

The reference holds netG/netD + two Adam optimizers (betas=(beta1, 0.99) —
note the non-default beta2, /root/reference/train.py:56-57) as Python object
state; here everything is a single flax struct so the whole G+D update is one
jitted, donate-able function.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    step: jax.Array  # int32 scalar, counts train steps (shared by G and D)


def make_optimizer(schedule: Callable, beta1: float) -> optax.GradientTransformation:
    # Adam defaults elsewhere follow torch: beta2 pinned to 0.99 by the
    # reference, eps=1e-8.
    return optax.adam(learning_rate=schedule, b1=beta1, b2=0.99, eps=1e-8)


def create_train_state(
    gen_model, disc_model, example_src, example_tgt, key,
    g_tx: optax.GradientTransformation, d_tx: optax.GradientTransformation,
) -> TrainState:
    import jax.numpy as jnp

    k_g, k_d = jax.random.split(key)
    g_params = gen_model.init(k_g, example_src)
    d_params = disc_model.init(k_d, example_src, example_tgt)
    return TrainState(
        g_params=g_params,
        d_params=d_params,
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params),
        step=jnp.zeros((), jnp.int32),
    )
