"""Learning-rate schedule.

The reference steps two MultiStepLR schedulers once per epoch with gamma=0.8
at the 10 milestones np.linspace(epoch_constant, total_epochs, 11)[:-1]
(/root/reference/train.py:191-195). Torch semantics: during run-epoch i
(0-based within this process) the lr is lr0 * gamma^|{m : m <= i}|.

Here the schedule is a pure function of the optimizer step count (so it lives
inside the jitted step): epoch = (step - step_offset) // steps_per_epoch.
``step_offset`` reproduces the reference's resume behavior — a restarted run
gets a *fresh* scheduler even though Adam moments are restored
(/root/reference/train.py:54-61,71-77).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def milestones(epoch_constant: int, total_epochs: int) -> np.ndarray:
    # int16 cast matches the reference exactly (train.py:193).
    return np.int16(np.linspace(epoch_constant, total_epochs, 11)[:-1])


def multistep_lr(lr: float, epoch_constant: int, total_epochs: int,
                 steps_per_epoch: int, gamma: float = 0.8,
                 step_offset: int = 0):
    ms = jnp.asarray(milestones(epoch_constant, total_epochs), jnp.int32)

    def schedule(step):
        epoch = (step - step_offset) // max(1, steps_per_epoch)
        decays = jnp.sum(epoch >= ms)
        return lr * jnp.power(gamma, decays.astype(jnp.float32))

    return schedule
