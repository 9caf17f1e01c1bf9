"""Device mesh + shardings.

The reference's only parallelism hook is a never-enabled nn.DataParallel wrap
(/root/reference/generators/generators.py:22-23 — SURVEY.md section 2.2).
Here data parallelism is first-class and TPU-native: a 1-D ``('data',)``
jax.sharding.Mesh, batches split along it, parameters/optimizer state
replicated. The jitted train step then runs SPMD — XLA inserts the gradient
all-reduce (psum) over ICI automatically from the sharding constraints; there
is no NCCL-style communication code to write.

The same module serves 1 real TPU chip, a v5e slice, and the CPU-simulated
8-device mesh the tests use (jax_num_cpu_devices=8).

A ``model`` mesh axis is accepted for future tensor-parallel shardings of the
widest conv layers; at the reference's model sizes (16*nf channels max) DP is
the only profitable axis, so model=1 everywhere today.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed for multi-host runs.

    TPU pods set the coordination env automatically; on other setups export
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID (explicitly
    forwarded — jax's own auto-detect only knows cluster schedulers). No-op
    (and returns False) for single-process runs, so the same entry point
    serves a laptop, 1 chip, and a slice.
    """
    import os
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        n_proc = os.environ.get("JAX_NUM_PROCESSES")
        proc_id = os.environ.get("JAX_PROCESS_ID")
        if n_proc is None or proc_id is None:
            raise ValueError(
                "JAX_COORDINATOR_ADDRESS is set but JAX_NUM_PROCESSES/"
                "JAX_PROCESS_ID are not — all three are required for an "
                "explicit multi-host launch")
        try:
            # int() errors must surface: silently falling back here would
            # degrade an intended multi-host run to P independent trainers
            # all writing the same artifact paths.
            num, pid = int(n_proc), int(proc_id)
        except ValueError as e:
            raise ValueError(
                f"JAX_NUM_PROCESSES={n_proc!r} / JAX_PROCESS_ID={proc_id!r} "
                "must be integers") from e
        try:
            jax.distributed.initialize(coordinator_address=addr,
                                       num_processes=num, process_id=pid)
            return True
        except RuntimeError:
            # RuntimeError covers both benign double-init AND genuine launch
            # failures (bad coordinator address, port conflict, mismatched
            # num_processes). Swallowing the latter would silently degrade an
            # intended multi-host run into P independent single-process
            # trainers all writing the same artifact paths — re-raise unless
            # the service really is already up.
            if _distributed_already_initialized():
                return False
            raise
    if os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") in ("", "localhost"):
        return False
    try:
        jax.distributed.initialize()
        return True
    except (RuntimeError, ValueError):
        if _distributed_already_initialized():
            return False
        return False  # single-process auto-detect miss (no cluster env)


def _distributed_already_initialized() -> bool:
    """True when jax.distributed has a live client (double-init detection)."""
    try:
        from jax._src import distributed as _dist
        return getattr(_dist.global_state, "client", None) is not None
    except Exception:
        return False


def make_mesh(n_data: int = 0, n_model: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_data <= 0:
        n_data = len(devs) // n_model
    need = n_data * n_model
    if need > len(devs):
        raise ValueError(f"mesh {n_data}x{n_model} needs {need} devices, "
                         f"have {len(devs)}")
    grid = np.array(devs[:need]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_rows(global_batch: int) -> slice:
    """The contiguous rows of the global batch this process must feed.

    Devices are laid out process-contiguously in ``jax.devices()`` (and hence
    in make_mesh's grid), so process p owns rows [p*B/P, (p+1)*B/P). For one
    process this is the whole batch.
    """
    pc, p = jax.process_count(), jax.process_index()
    if global_batch % pc:
        raise ValueError(f"global batch {global_batch} must divide evenly "
                         f"over {pc} processes")
    per = global_batch // pc
    return slice(p * per, (p + 1) * per)


def shard_batch(mesh: Mesh, *arrays) -> tuple:
    """Place host arrays onto the mesh, batch dim split over 'data'.

    Single-process: ``arrays`` are full global batches. Multi-process:
    ``arrays`` are each process's local rows (see local_batch_rows) and the
    global array is assembled without any cross-host data movement.
    """
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        out = tuple(jax.make_array_from_process_local_data(s, a)
                    for a in arrays)
    else:
        out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def shard_state(mesh: Mesh, tree: Any) -> Any:
    """Replicate a parameter/optimizer pytree across the mesh."""
    s = replicate_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_state_tp(mesh: Mesh, tree: Any, min_features: int = 256) -> Any:
    """Tensor-parallel placement: conv kernels (4-D leaves, HWIO) with at
    least ``min_features`` output channels divisible by the 'model' axis are
    split on the output-feature dim; everything else replicates. XLA then
    propagates the sharding through the matching biases/norms and inserts
    the collectives. With model=1 this degrades to plain replication.

    The reference has no TP (SURVEY.md section 2.2); this serves its stated
    optional role: splitting the widest layers (up to 16*nf channels in
    UNet++) when a model no longer fits or to shrink per-chip weight traffic.
    """
    n_model = mesh.shape["model"]
    repl = replicate_sharding(mesh)
    split = NamedSharding(mesh, P(None, None, None, "model"))

    def place(x):
        if (n_model > 1 and hasattr(x, "ndim") and x.ndim == 4
                and x.shape[-1] >= min_features and x.shape[-1] % n_model == 0):
            return jax.device_put(x, split)
        return jax.device_put(x, repl)

    return jax.tree.map(place, tree)
