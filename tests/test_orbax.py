"""Orbax periodic-checkpoint backend (--ckpt_backend orbax): sharded
save/restore roundtrip and Trainer crash-recovery resume from the latest
step checkpoint (no final_model.pth needed — the reference only writes its
artifact at the END of a completed run, /root/reference/train.py:203-209)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from tactile_gan_tpu.parallel.mesh import make_mesh
from tactile_gan_tpu.utils.orbax_ckpt import OrbaxBackend

from test_train import build_dataset, tiny_cfg


def test_orbax_roundtrip_preserves_values_and_sharding(tmp_path):
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(4, 2)
    arr = jax.device_put(
        np.arange(64, dtype=np.float32).reshape(8, 8),
        NamedSharding(mesh, P("data", "model")))
    rep = jax.device_put(np.ones((3,), np.float32),
                         NamedSharding(mesh, P()))
    tree = {"a": arr, "b": rep, "step": jnp.zeros((), jnp.int32) + 7}

    be = OrbaxBackend(str(tmp_path / "ck"))
    try:
        assert be.latest_step() is None
        be.save(11, tree)
        be.wait()
        assert be.latest_step() == 11
        got = be.restore(11, tree)
        np.testing.assert_array_equal(np.asarray(got["a"]), np.asarray(arr))
        np.testing.assert_array_equal(np.asarray(got["b"]), np.asarray(rep))
        assert int(got["step"]) == 7
        # Restore honors the template's shardings (each shard back on its
        # owning device — the no-gather property the backend exists for).
        assert got["a"].sharding == arr.sharding
    finally:
        be.close()


def test_trainer_orbax_checkpoint_and_resume(tmp_path):
    cfg = tiny_cfg(tmp_path, total_epochs=2, checkpoint_interval=1,
                   ckpt_backend="orbax", folder_save="m1", folder_load="m1")
    ds = build_dataset(cfg)
    tr = Trainer_run(cfg, ds)
    spe = tr.steps_per_epoch

    orbax_dir = os.path.join(cfg.work_root, "checkpoints", "m1", "orbax")
    assert os.path.isdir(orbax_dir)
    be = OrbaxBackend(orbax_dir)
    latest = be.latest_step()
    be.close()
    assert latest == 2 * spe  # manager step == global train step

    # Crash-recovery shape: no final_model.pth, resume must come from the
    # latest orbax step (and set the scheduler offset from it).
    os.remove(os.path.join(cfg.work_root, "models", "m1", "final_model.pth"))
    cfg2 = tiny_cfg(tmp_path, total_epochs=1, checkpoint_interval=-1,
                    ckpt_backend="orbax", folder_save="m2", folder_load="m1",
                    continue_training=True)
    from tactile_gan_tpu.train import Trainer
    tr2 = Trainer(cfg2, ds)
    assert tr2.step_offset == latest
    tr2.train(progress=False)
    assert np.isfinite(tr2.gen_loss[-1])
    assert int(jax.device_get(tr2.state.step)) == latest + spe


def Trainer_run(cfg, ds):
    from tactile_gan_tpu.train import Trainer

    tr = Trainer(cfg, ds)
    tr.run_and_save(progress=False)
    return tr
