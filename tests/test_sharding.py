"""Data-parallel sharding tests on the virtual 8-device CPU mesh
(SURVEY.md section 4: "distributed without a cluster")."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tactile_gan_tpu.core.config import TrainConfig
from tactile_gan_tpu.models.factory import create_discriminator, create_generator
from tactile_gan_tpu.parallel.mesh import (
    batch_sharding, make_mesh, shard_batch, shard_state,
)
from tactile_gan_tpu.train.schedule import multistep_lr
from tactile_gan_tpu.train.state import create_train_state, make_optimizer
from tactile_gan_tpu.train.step import build_train_step

RNG = np.random.default_rng(11)


def _setup(cfg, batch):
    gen = create_generator(cfg.gen, cfg.output_dim, cfg.nf, cfg.activation)
    disc = create_discriminator("patch", cfg.nf, cfg.activation)
    sched = multistep_lr(cfg.lr, cfg.epoch_constant, cfg.total_epochs, 1)
    g_tx, d_tx = make_optimizer(sched, cfg.beta1), make_optimizer(sched, cfg.beta1)
    ex = jnp.zeros((batch, cfg.image_size, cfg.image_size, 3))
    state = create_train_state(gen, disc, ex, ex, jax.random.key(0), g_tx, d_tx)
    step = build_train_step(cfg, gen, disc, g_tx, d_tx)
    return state, step


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    mesh = make_mesh(4)
    assert mesh.devices.shape == (4, 1)
    with pytest.raises(ValueError):
        make_mesh(16)


def test_shard_batch_splits_batch_dim():
    mesh = make_mesh(8)
    x = np.zeros((8, 4, 4, 3), np.float32)
    sharded = shard_batch(mesh, x)
    assert sharded.sharding == batch_sharding(mesh)
    assert sharded.addressable_shards[0].data.shape == (1, 4, 4, 3)
    assert len(sharded.addressable_shards) == 8


def test_dp_train_step_matches_single_device():
    """One step on the 8-device mesh must produce the same losses and params
    as the same step single-device (same inputs, same keys)."""
    cfg = TrainConfig(gen="UNet++", nf=4, batch_size=8, image_size=32,
                      loss="ls", lambda_per=0.0, lambda_gp=0.01,
                      compute_dtype="float32", no_aug=True)
    src = RNG.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    tgt = RNG.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    key = jax.random.key(3)

    state1, step1 = _setup(cfg, 8)
    ref_state, ref_m = step1(state1, jnp.asarray(src), jnp.asarray(tgt), key,
                             apply_gp=True)

    mesh = make_mesh(8)
    state2, step2 = _setup(cfg, 8)
    state2 = shard_state(mesh, state2)
    s_src, s_tgt = shard_batch(mesh, src, tgt)
    dp_state, dp_m = step2(state2, s_src, s_tgt, key, apply_gp=True)

    for k in ("loss_d", "loss_g", "loss_l1", "loss_gp"):
        np.testing.assert_allclose(float(getattr(ref_m, k)),
                                   float(getattr(dp_m, k)), rtol=2e-4,
                                   err_msg=k)
    # Statistical comparison (CLAUDE.md convention): cross-device reduction
    # order shifts gradients by ~1e-7, and Adam's first-step normalization
    # amplifies a NEAR-ZERO gradient all the way to ~2*lr (2e-3) when the
    # reorder flips its sign — so a handful of elements can differ at the
    # 2*lr scale while the parameter sets remain the same distribution.
    ref_leaves = jax.tree.leaves(jax.device_get(ref_state.g_params))
    dp_leaves = jax.tree.leaves(jax.device_get(dp_state.g_params))
    lr = cfg.lr
    for a, b in zip(ref_leaves, dp_leaves):
        diff = np.abs(np.asarray(a) - np.asarray(b)).ravel()
        assert diff.max() <= 2.5 * lr, diff.max()  # Adam step-1 envelope
        outliers = diff > 2e-4
        # The non-amplified bulk must agree tightly, and only a handful of
        # near-zero-gradient elements may ride the Adam amplification.
        assert np.mean(diff[~outliers]) < 2e-5 if (~outliers).any() else True
        assert outliers.sum() <= max(2, int(0.01 * diff.size)), outliers.sum()


def test_tp_sharded_step_matches_replicated():
    """2x4 (data x model) mesh: wide conv kernels split on output features;
    one train step must match the pure-DP result (XLA inserts the TP
    collectives from the param shardings alone)."""
    from tactile_gan_tpu.parallel.mesh import shard_state_tp

    cfg = TrainConfig(gen="UNet++", nf=8, batch_size=2, image_size=32,
                      loss="ls", lambda_per=0.0, lambda_gp=0.0,
                      compute_dtype="float32", no_aug=True)
    src = RNG.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    tgt = RNG.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    key = jax.random.key(7)

    state1, step1 = _setup(cfg, 2)
    ref_state, ref_m = step1(state1, jnp.asarray(src), jnp.asarray(tgt), key,
                             apply_gp=False)

    mesh = make_mesh(n_data=2, n_model=4)
    state2, step2 = _setup(cfg, 2)
    state2 = shard_state_tp(mesh, state2, min_features=64)
    # check at least one leaf actually got split
    kernels = [x for x in jax.tree.leaves(state2.g_params)
               if hasattr(x, "ndim") and x.ndim == 4 and x.shape[-1] >= 64]
    assert any(not k.sharding.is_fully_replicated for k in kernels)

    s_src, s_tgt = shard_batch(mesh, src, tgt)
    tp_state, tp_m = step2(state2, s_src, s_tgt, key, apply_gp=False)
    for k in ("loss_d", "loss_g", "loss_l1"):
        np.testing.assert_allclose(float(getattr(ref_m, k)),
                                   float(getattr(tp_m, k)), rtol=2e-4,
                                   err_msg=k)


def test_dp_params_stay_replicated():
    """After a step, parameters must still be fully replicated (XLA inserts
    the gradient all-reduce; no divergence across devices)."""
    cfg = TrainConfig(gen="BCDUNet", nf=4, batch_size=8, image_size=32,
                      loss="hinge", lambda_per=0.0, lambda_gp=0.0,
                      compute_dtype="float32", no_aug=False)
    mesh = make_mesh(8)
    state, step = _setup(cfg, 8)
    state = shard_state(mesh, state)
    src = RNG.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    tgt = RNG.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    s_src, s_tgt = shard_batch(mesh, src, tgt)
    state, _ = step(state, s_src, s_tgt, jax.random.key(0), apply_gp=False)

    leaf = jax.tree.leaves(state.g_params)[0]
    assert leaf.sharding.is_fully_replicated
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_trainer_mesh_validation(tmp_path):
    """Oversized --mesh_model must raise a clear error, not ZeroDivisionError
    (review finding: avail = devices // mesh_model hit 0)."""
    from test_train import build_dataset, tiny_cfg

    cfg = tiny_cfg(tmp_path, mesh_model=16)
    ds = build_dataset(cfg)
    from tactile_gan_tpu.train import Trainer
    with pytest.raises(ValueError, match="mesh_model 16 exceeds"):
        Trainer(cfg, ds)


def test_maybe_init_distributed_env_validation(monkeypatch):
    """Half-set explicit coordination env must fail loudly — silently
    degrading to independent single-process runs would corrupt artifacts."""
    from tactile_gan_tpu.parallel.mesh import maybe_init_distributed

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    with pytest.raises(ValueError, match="all three are required"):
        maybe_init_distributed()
    monkeypatch.setenv("JAX_NUM_PROCESSES", "two")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    with pytest.raises(ValueError, match="must be integers"):
        maybe_init_distributed()


@pytest.mark.parametrize("backend", ["native", "orbax"])
def test_twohost_distributed_train(tmp_path, backend):
    # (name avoids "s_": pytest tmp paths embed test names and the pairing
    # rewrite maps s_ -> t_ in basenames — see CLAUDE.md.)
    """Real multi-host semantics on one machine: 2 subprocess "hosts" x 2
    virtual CPU devices each, jax.distributed over a localhost coordinator,
    the full Trainer end-to-end. Asserts both processes agree on the global
    (replicated) losses and that only process 0 wrote artifacts. The orbax
    variant additionally proves the sharded no-gather save + latest-step
    crash resume cross-process (each process restores its own shards)."""
    import socket
    import subprocess
    import sys

    from PIL import Image

    # Dataset shared by both workers.
    rng = np.random.default_rng(0)
    sdir = tmp_path / "data" / "train" / "source"
    tdir = tmp_path / "data" / "train" / "tactile"
    sdir.mkdir(parents=True)
    tdir.mkdir(parents=True)
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(sdir / f"s_{i:04d}.png")
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        ).save(tdir / f"t_{i:04d}.tiff")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo_root, "tests", "multihost_worker.py")
    env = dict(os.environ, PYTHONPATH=repo_root)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2", str(tmp_path),
             backend],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=repo_root, env=env)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"

    results = [json.loads([ln for ln in out.splitlines()
                           if ln.startswith("{")][-1]) for out, _ in outs]
    by_pid = {r["pid"]: r for r in results}
    assert set(by_pid) == {0, 1}
    for k in ("gen_loss", "disc_loss", "l1_loss"):
        assert len(by_pid[0][k]) == 2  # two epochs
        np.testing.assert_allclose(by_pid[0][k], by_pid[1][k], rtol=1e-6,
                                   err_msg=k)

    # Artifacts written exactly once (by process 0).
    mdir = tmp_path / "models" / "mh"
    assert (mdir / "final_model.pth").exists()
    assert (mdir / "params.txt").exists()
    for name in ("gen", "disc", "l1", "per", "gp"):
        assert (mdir / f"{name}loss.npy").exists()
    if backend == "native":
        assert (tmp_path / "checkpoints" / "mh" / "model_1.pth").exists()
        assert (tmp_path / "checkpoints" / "mh" / "model_2.pth").exists()
    else:
        # Sharded step checkpoints + the worker-side asserted latest-step
        # resume (resumed_step = steps_per_epoch * total_epochs = 4).
        odir = tmp_path / "checkpoints" / "mh" / "orbax"
        assert odir.is_dir() and any(odir.iterdir())
        for r in results:
            assert r["resumed_step"] == 4, r


# ---------------------------------------------------------------------------
# Pallas under a mesh (round-2 VERDICT weak #2): jax 0.9 Mosaic kernels need
# Manual axes, so instance_norm_act shard_maps itself over the data axis when
# an ambient mesh (jax.sharding.set_mesh) is present.
# ---------------------------------------------------------------------------

def test_pallas_norm_under_mesh_matches_xla():
    """Fused norm fwd + all grads under a 4x1 mesh (interpret mode on the
    CPU devices) must match the XLA reference computed mesh-free."""
    from jax.sharding import NamedSharding, PartitionSpec as P, set_mesh
    from tactile_gan_tpu.ops.pallas.instance_norm import (
        _xla_reference, instance_norm_act,
    )

    mesh = make_mesh(n_data=4, n_model=1)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 64)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    o = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))

    def loss(x, s, o):
        return jnp.sum(instance_norm_act(x, s, o, act="leaky_relu") ** 2)

    def ref_loss(x, s, o):
        return jnp.sum(_xla_reference(x, s, o, "leaky_relu", 0.2) ** 2)

    with set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        y = jax.jit(lambda a, b, c: instance_norm_act(a, b, c,
                                                      act="leaky_relu"))(xs, s, o)
        gx, gs, go = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(xs, s, o)
        assert y.sharding.spec == P("data")  # stayed sharded, no gather

    yref = _xla_reference(x, s, o, "leaky_relu", 0.2)
    rx, rs, ro = jax.grad(ref_loss, argnums=(0, 1, 2))(x, s, o)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(go), np.asarray(ro), rtol=2e-5)


def test_pallas_norm_mesh_fallbacks():
    """Indivisible batches and tensor-parallel meshes take the XLA path
    (still correct) instead of the shard_mapped kernel."""
    from jax.sharding import set_mesh
    from tactile_gan_tpu.ops.pallas.instance_norm import (
        _xla_reference, instance_norm_act,
    )

    rng = np.random.default_rng(4)
    s = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    o = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))

    x3 = jnp.asarray(rng.normal(size=(3, 32, 32, 16)).astype(np.float32))
    with set_mesh(make_mesh(n_data=4, n_model=1)):
        y = jax.jit(lambda a: instance_norm_act(a, s, o, act="relu"))(x3)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_xla_reference(x3, s, o, "relu", 0.2)),
        atol=2e-5)

    x4 = jnp.asarray(rng.normal(size=(4, 32, 32, 16)).astype(np.float32))
    with set_mesh(make_mesh(n_data=2, n_model=2)):
        y = jax.jit(lambda a: instance_norm_act(a, s, o, act="relu"))(x4)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_xla_reference(x4, s, o, "relu", 0.2)),
        atol=2e-5)


def test_pallas_train_step_under_mesh_matches_single_device(tmp_path):
    """The full Trainer with the Pallas kernels engaged (force_pallas,
    interpret mode) on the 8-CPU mesh must match the mesh-free XLA-path
    Trainer's losses — proving the production kernel path end to end under
    SPMD, not just the norm op in isolation."""
    from test_train import build_dataset, tiny_cfg

    from tactile_gan_tpu.train import Trainer

    base = dict(total_epochs=1, batch_size=4, image_size=32, nf=4,
                lambda_gp=0.01, seed=9)
    # ONE dataset for both runs (make_dataset draws from a stateful RNG, so
    # two build_dataset calls would produce different images).
    cfg_ref = tiny_cfg(tmp_path, use_pallas=False, mesh_data=1, **base)
    ds = build_dataset(cfg_ref, n=4)
    tr_ref = Trainer(cfg_ref, ds, use_mesh=False)
    tr_ref.train(progress=False)

    cfg_p = tiny_cfg(tmp_path, force_pallas=True, mesh_data=4, **base)
    tr_p = Trainer(cfg_p, ds)
    assert tr_p.mesh is not None and tr_p.mesh.shape["data"] == 4
    assert tr_p.gen_model.use_pallas  # the gate engaged the kernel
    tr_p.train(progress=False)

    for k in ("gen_loss", "disc_loss", "l1_loss", "gp_loss"):
        np.testing.assert_allclose(getattr(tr_ref, k), getattr(tr_p, k),
                                   rtol=3e-4, err_msg=k)


def test_packed_row0_step_under_mesh_matches_single_device():
    """The packed-resident row-0 model (ops/packed_row.py) under a
    data-parallel mesh produces the same losses/params as single-device.
    On CPU the packed convs run their exact XLA twin, which GSPMD
    partitions natively; on TPU the Pallas kernel shard_maps itself over
    the data axis (same ambient-mesh mechanism as the norm kernels)."""
    def setup(batch):
        cfg = TrainConfig(gen="UNet++", nf=4, batch_size=batch,
                          image_size=32, loss="ls", lambda_per=0.0,
                          lambda_gp=0.01, compute_dtype="float32",
                          no_aug=True)
        gen = create_generator(cfg.gen, cfg.output_dim, cfg.nf,
                               cfg.activation, packed_row0=True)
        disc = create_discriminator("patch", cfg.nf, cfg.activation)
        sched = multistep_lr(cfg.lr, cfg.epoch_constant, cfg.total_epochs, 1)
        g_tx = make_optimizer(sched, cfg.beta1)
        d_tx = make_optimizer(sched, cfg.beta1)
        ex = jnp.zeros((batch, 32, 32, 3))
        state = create_train_state(gen, disc, ex, ex, jax.random.key(0),
                                   g_tx, d_tx)
        return state, build_train_step(cfg, gen, disc, g_tx, d_tx)

    # A dedicated generator: the shared module RNG's state depends on test
    # ordering, and the tiny nf=4 net amplifies fp-order differences
    # (ReLU-flip conditioning, see test_models) unpredictably across draws.
    local_rng = np.random.default_rng(1234)
    src = local_rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    tgt = local_rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    key = jax.random.key(5)

    state1, step1 = setup(8)
    ref_state, ref_m = step1(state1, jnp.asarray(src), jnp.asarray(tgt), key,
                             apply_gp=True)

    mesh = make_mesh(4)
    state2, step2 = setup(8)
    state2 = shard_state(mesh, state2)
    s_src, s_tgt = shard_batch(mesh, src, tgt)
    with jax.sharding.set_mesh(mesh):
        dp_state, dp_m = step2(state2, s_src, s_tgt, key, apply_gp=True)

    for k in ("loss_d", "loss_g", "loss_l1", "loss_gp"):
        np.testing.assert_allclose(float(getattr(ref_m, k)),
                                   float(getattr(dp_m, k)), rtol=2e-4,
                                   atol=1e-5)
    ref_leaves = jax.tree.leaves(ref_state.g_params)
    dp_leaves = jax.tree.leaves(jax.device_get(dp_state.g_params))
    for a, b in zip(ref_leaves, dp_leaves):
        # Adam's step-1 normalization amplifies fp-order noise on near-zero
        # gradients (BASELINE round 1); bound statistically, not per-element.
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).mean() < 2e-5
        assert np.abs(a - b).max() < 5e-4
