"""Worker process for the 2-process jax.distributed CPU smoke test
(tests/test_sharding.py::test_twohost_distributed_train).

Each worker is one "host" of a simulated 2-host pod: 2 local virtual CPU
devices, jax.distributed over a localhost coordinator, the real Trainer
end-to-end. Process 0 must be the only artifact writer; both processes must
compute identical (replicated) global losses.
"""

import json
import os
import sys


def main() -> None:
    port, pid, nproc, root = sys.argv[1:5]
    ckpt_backend = sys.argv[5] if len(sys.argv) > 5 else "native"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = nproc
    os.environ["JAX_PROCESS_ID"] = pid

    from tactile_gan_tpu.parallel.mesh import maybe_init_distributed
    assert maybe_init_distributed(), "distributed init failed"
    assert jax.process_count() == int(nproc)
    assert jax.local_device_count() == 2
    assert len(jax.devices()) == 2 * int(nproc)

    from tactile_gan_tpu.core.config import TrainConfig
    from tactile_gan_tpu.data.dataset import PairedDataset
    from tactile_gan_tpu.train.loop import Trainer

    cfg = TrainConfig(
        data=os.path.join(root, "data"), gen="UNet++", nf=4, batch_size=4,
        image_size=32, loss="ls", lambda_per=0.0, lambda_gp=0.0,
        total_epochs=2, threads=2, compute_dtype="float32", use_pallas=False,
        folder_save="mh", folder_load="mh", checkpoint_interval=1, seed=5,
        ckpt_backend=ckpt_backend,
    )
    dataset = PairedDataset(os.path.join(root, "data", "train", "source"),
                            size=cfg.image_size, mode="train", aug=True,
                            target=cfg.target)
    trainer = Trainer(cfg, dataset)
    assert trainer.mesh is not None and dict(trainer.mesh.shape) == {
        "data": 4, "model": 1}, trainer.mesh
    assert trainer.is_main_process == (pid == "0")
    trainer.run_and_save(progress=False)

    resumed_step = None
    if ckpt_backend == "orbax":
        # Crash-recovery path, cross-process: a fresh Trainer with
        # --continue_training must pick up the LATEST sharded orbax step
        # (every process restores its own shards; no host gather).
        import dataclasses
        cfg2 = dataclasses.replace(cfg, continue_training=True)
        trainer2 = Trainer(cfg2, dataset)
        resumed_step = int(trainer2.step_offset)
        expected = trainer.steps_per_epoch * cfg.total_epochs
        assert resumed_step == expected, (resumed_step, expected)
        # The restored params must equal the trained finals on every process.
        import jax.numpy as jnp
        a = jax.tree.leaves(trainer._host_state().g_params)
        b = jax.tree.leaves(trainer2._host_state().g_params)
        for x, y in zip(a, b):
            assert jnp.allclose(x, y), "orbax resume params mismatch"

    print(json.dumps({
        "pid": int(pid),
        "gen_loss": trainer.gen_loss,
        "disc_loss": trainer.disc_loss,
        "l1_loss": trainer.l1_loss,
        "resumed_step": resumed_step,
    }), flush=True)


if __name__ == "__main__":
    main()
