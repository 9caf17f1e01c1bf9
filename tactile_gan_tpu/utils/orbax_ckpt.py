"""Orbax checkpoint backend (``--ckpt_backend orbax``).

The native backend (utils/checkpoint.py) implements the reference's artifact
contract: gather the state to host 0 and write one msgpack ``*.pth``
(/root/reference/train.py:203-209 shape). That is right for the final
artifact but does not scale as a *periodic* checkpoint path: a pod-sized
state has to be all-gathered into one host's memory every interval.

Orbax is the TPU-scale alternative for periodic checkpoints:

- **sharded saves** — every host writes only its addressable shards; no
  cross-host gather, no single-host memory spike;
- **async** — the device-to-host copy happens inline (so the train step may
  safely donate the state buffers afterwards) and the disk writes overlap
  the next epochs;
- **atomic, step-numbered directories** with automatic latest-step
  discovery for crash recovery;
- **sharding-aware restore** — a restore target built from the live (mesh-
  sharded) TrainState brings every shard back to the device that owns it.

``final_model.pth`` stays on the native backend in both modes — it is the
reference-compatible artifact that eval/runner.py and the torch-migration
path read.
"""

from __future__ import annotations

import os
from typing import Any, Optional


class OrbaxBackend:
    """Thin wrapper over ``orbax.checkpoint.CheckpointManager`` holding the
    whole TrainState as one pytree item. The manager step number is the
    GLOBAL TRAIN STEP (``int(state.step)``) so ``latest_step()`` doubles as
    the scheduler's ``step_offset`` on resume."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                enable_async_checkpointing=True),
        )

    @property
    def directory(self) -> str:
        return str(self._mngr.directory)

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def save(self, step: int, state: Any) -> None:
        """Async save; collective — call from every process. Device buffers
        are copied out before this returns (donation-safe)."""
        self._mngr.save(step, args=self._ocp.args.StandardSave(state))

    def restore(self, step: int, template: Any) -> Any:
        """Restore into the structure/shardings of ``template`` (pass the
        live TrainState: its NamedShardings direct each shard to its
        device)."""
        return self._mngr.restore(
            step, args=self._ocp.args.StandardRestore(template))

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()
