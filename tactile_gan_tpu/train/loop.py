"""Training orchestration — the reference Train_GAN class
(/root/reference/train.py:22-227) rebuilt around one jitted step.

Artifacts are format-compatible:
- ``models/{folder_save}/final_model.pth``          (msgpack pytree, same keys)
- ``models/{folder_save}/{gen,disc,l1,per,gp}loss.npy``  (per-epoch means)
- ``models/{folder_save}/params.txt``               (same JSON schema)
- ``checkpoints/{folder_save}/model_{epoch}.pth``   (periodic, same gating)
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from tactile_gan_tpu.core import rng as rng_streams
from tactile_gan_tpu.core.config import TrainConfig
from tactile_gan_tpu.data.dataset import PairedDataset
from tactile_gan_tpu.models.factory import create_discriminator, create_generator
from tactile_gan_tpu.models.vgg import load_vgg_features, vgg_features_apply
from tactile_gan_tpu.parallel.mesh import (
    local_batch_rows, make_mesh, shard_batch, shard_state, shard_state_tp,
)
from tactile_gan_tpu.train.schedule import multistep_lr
from tactile_gan_tpu.train.state import TrainState, create_train_state, make_optimizer
from tactile_gan_tpu.train.step import build_train_step
from tactile_gan_tpu.utils.checkpoint import (
    AsyncCheckpointer, load_checkpoint, restore_partial, save_checkpoint,
)
from tactile_gan_tpu.utils.io import mkdir

import jax.numpy as jnp
import contextlib


def _null_cm():
    return contextlib.nullcontext()


class Trainer:
    def __init__(self, cfg: TrainConfig, dataset: PairedDataset,
                 mesh=None, use_mesh: bool = True):
        self.cfg = cfg
        self.dataset = dataset
        n_model = max(1, cfg.mesh_model)
        if mesh is not None:
            self.mesh = mesh
        elif use_mesh:
            n_devices = len(jax.devices())
            if n_model > n_devices:
                raise ValueError(
                    f"--mesh_model {n_model} exceeds the {n_devices} visible "
                    f"devices")
            avail = n_devices // n_model
            n = cfg.mesh_data if cfg.mesh_data > 0 else avail
            if jax.process_count() > 1:
                # Multi-host: the mesh MUST cover every process's devices —
                # local_batch_rows assigns every process batch rows, and a
                # truncated mesh would leave later hosts with rows but no
                # addressable mesh devices. No silent shrinking here.
                if n != avail:
                    raise ValueError(
                        f"multi-host runs need the data axis to cover all "
                        f"devices: --mesh_data {cfg.mesh_data} != "
                        f"{avail} (= {n_devices} devices / mesh_model "
                        f"{n_model})")
                if cfg.batch_size % (n or 1):
                    raise ValueError(
                        f"global batch {cfg.batch_size} must divide over the "
                        f"{n}-wide data axis on a multi-host mesh")
            else:
                # Single process: shrink to the largest batch divisor the
                # devices allow (idle devices are fine here).
                n = max(1, min(n, cfg.batch_size, avail))
                while cfg.batch_size % n:
                    n -= 1
            self.mesh = make_mesh(n, n_model) if n * n_model > 1 else None
        else:
            self.mesh = None

        compute_dtype = jnp.dtype(cfg.compute_dtype)
        # The Pallas gate is a per-chip-batch property: pass the mesh's actual
        # data-axis width so a global batch 16 over 4 chips (per-chip b4, the
        # regime where the kernel wins) engages the kernel.
        data_width = self.mesh.shape["data"] if self.mesh is not None else 1
        use_pallas = cfg.effective_use_pallas(data_axis_size=data_width)
        self.gen_model = create_generator(
            cfg.gen, output_dim=cfg.output_dim, nf=cfg.nf,
            activation=cfg.activation, compute_dtype=compute_dtype,
            use_pallas=use_pallas,
            space_to_depth=cfg.space_to_depth,
            split_concat=cfg.split_concat,
            lane_pack=cfg.effective_lane_pack(data_axis_size=data_width),
            packed_row0=cfg.effective_packed_row0(data_axis_size=data_width),
            bf16_resident=cfg.effective_bf16_resident(
                data_axis_size=data_width))
        self.disc_model = create_discriminator(
            "patch", nf=cfg.nf, activation=cfg.activation,
            compute_dtype=compute_dtype,
            use_pallas=use_pallas,
            resident=cfg.effective_disc_bf16(),
            same_pad=cfg.disc_same_pad)

        vgg_apply = vgg_params = None
        self.vgg_random_fallback = False
        if cfg.lambda_per != 0 and cfg.version == 1:
            from tactile_gan_tpu.models.vgg import (
                fallback_banner, resolve_weights_path,
            )
            if not resolve_weights_path(cfg.vgg_weights):
                self.vgg_random_fallback = True
                if jax.process_index() == 0:
                    print(fallback_banner())
            vgg_apply = vgg_features_apply
            vgg_params = load_vgg_features(cfg.vgg_weights)

        # Batching geometry: static step shapes. With enough data we drop the
        # last partial batch (the compiled-shape analogue of the reference's
        # ragged final batch); tiny datasets pad-and-repeat instead.
        # KNOWN BIAS in pad mode: the duplicated pad rows participate in the
        # loss means, slightly up-weighting the repeated sample vs the
        # reference's ragged final batch. Pad mode only triggers for datasets
        # smaller than one batch (or explicit drop_last=False), where exact
        # reference parity is already ill-defined (the reference crashes on
        # sub-batch datasets with label smoothing, generators.py:52-63).
        n = len(dataset)
        if n == 0:
            raise ValueError(f"no images found under {dataset.img_dir}")
        self.pad_mode = n < cfg.batch_size or not cfg.drop_last
        if self.pad_mode:
            self.steps_per_epoch = -(-n // cfg.batch_size)
        else:
            self.steps_per_epoch = n // cfg.batch_size

        # Resume first (it defines the scheduler's step offset — the
        # reference restarts its scheduler on resume, train.py:54-77).
        # With the orbax backend, the latest sharded step checkpoint under
        # checkpoints/{folder_load}/orbax takes precedence (crash recovery:
        # final_model.pth only exists after a *completed* run); it restores
        # later, once the sharded state template exists.
        restored = None
        self._orbax_resume = None  # (OrbaxBackend, latest_step)
        if cfg.continue_training:
            if cfg.ckpt_backend == "orbax":
                from tactile_gan_tpu.utils.orbax_ckpt import OrbaxBackend
                load_dir = os.path.join(cfg.work_root, "checkpoints",
                                        cfg.folder_load, "orbax")
                if os.path.isdir(load_dir):
                    backend = OrbaxBackend(load_dir)
                    latest = backend.latest_step()
                    if latest is not None:
                        self._orbax_resume = (backend, latest)
                    else:
                        backend.close()
            if self._orbax_resume is None:
                path = os.path.join(cfg.work_root, "models", cfg.folder_load,
                                    "final_model.pth")
                restored = load_checkpoint(path)
        step_offset = (self._orbax_resume[1] if self._orbax_resume
                       else int(restored["step"]) if restored else 0)

        schedule = multistep_lr(cfg.lr, cfg.epoch_constant, cfg.total_epochs,
                                self.steps_per_epoch, step_offset=step_offset)
        self._schedule = schedule
        self.step_offset = step_offset
        self.g_tx = make_optimizer(schedule, cfg.beta1)
        self.d_tx = make_optimizer(schedule, cfg.beta1)

        root = rng_streams.root_key(cfg.seed)
        self.train_key = rng_streams.stream(root, rng_streams.STREAM_DATA_ORDER)
        init_key = rng_streams.stream(root, rng_streams.STREAM_PARAMS_G)
        example_src = jnp.zeros(
            (cfg.batch_size, cfg.image_size, cfg.image_size, cfg.input_dim),
            jnp.float32)
        example_tgt = jnp.zeros(
            (cfg.batch_size, cfg.image_size, cfg.image_size, cfg.output_dim),
            jnp.float32)
        self.state = create_train_state(self.gen_model, self.disc_model,
                                        example_src, example_tgt, init_key,
                                        self.g_tx, self.d_tx)
        if restored is not None:
            # Optimizer states may be absent (migrated torch checkpoints carry
            # weights only); they then stay freshly initialized — the same
            # "restart the schedule" behavior the reference has on resume.
            self.state = TrainState(
                g_params=restore_partial(self.state.g_params, restored["gen"]),
                d_params=restore_partial(self.state.d_params,
                                         restored.get("disc", {})),
                g_opt_state=restore_partial(
                    self.state.g_opt_state,
                    restored.get("optimizerG_state_dict", {})),
                d_opt_state=restore_partial(
                    self.state.d_opt_state,
                    restored.get("optimizerD_state_dict", {})),
                step=jnp.asarray(step_offset, jnp.int32),
            )
        if self.mesh is not None:
            if self.mesh.shape.get("model", 1) > 1:
                self.state = shard_state_tp(self.mesh, self.state)
            else:
                self.state = shard_state(self.mesh, self.state)

        # Orbax periodic-save backend + deferred orbax restore (the sharded
        # state above is the restore template, so every shard lands on the
        # device that owns it — no host gather in either direction).
        self._orbax = None
        if cfg.ckpt_backend == "orbax" and cfg.checkpoint_interval != -1:
            from tactile_gan_tpu.utils.orbax_ckpt import OrbaxBackend
            save_dir = os.path.abspath(os.path.join(
                cfg.work_root, "checkpoints", cfg.folder_save, "orbax"))
            if (self._orbax_resume is not None
                    and self._orbax_resume[0].directory == save_dir):
                self._orbax = self._orbax_resume[0]
            else:
                self._orbax = OrbaxBackend(save_dir)
        if self._orbax_resume is not None:
            backend, latest = self._orbax_resume
            self.state = backend.restore(latest, self.state)
            if backend is not self._orbax:
                backend.close()

        self.step_fn = build_train_step(
            cfg, self.gen_model, self.disc_model, self.g_tx, self.d_tx,
            vgg_apply=vgg_apply, vgg_params=vgg_params)

        # Multi-host: every process walks the same shuffled order but decodes
        # only its own batch rows; artifact/checkpoint writes and progress
        # prints happen on process 0 only.
        self.is_main_process = jax.process_index() == 0
        self._local_rows = (local_batch_rows(cfg.batch_size)
                            if jax.process_count() > 1 else slice(None))

        # Per-epoch loss curves (reference train.py:64-68).
        self.gen_loss, self.disc_loss = [], []
        self.l1_loss, self.per_loss, self.gp_loss = [], [], []
        # Wall-clock per epoch (epoch 0 includes the step compile); bench.py
        # reads this for the end-to-end epochs metric.
        self.epoch_seconds = []
        self._async_ckpt = AsyncCheckpointer()
        # H2D staging thread: through the axon relay jax.device_put BLOCKS
        # the calling thread for the full transfer (~110 ms for a 6 MB b16
        # batch — measured, scripts/probe_e2e.py round 4), which serialized
        # with the step dispatch and made the host the epoch bottleneck.
        # A 1-worker pool moves that block off the main thread so the
        # transfer of batch k+1 rides under the device's step k.
        import concurrent.futures as _cf
        self._h2d = _cf.ThreadPoolExecutor(max_workers=1,
                                           thread_name_prefix="h2d")
        # One device-side stack of the epoch's per-step metrics: device_get
        # of a LIST of scalars costs one relay round-trip per buffer
        # (5 scalars x steps = ~1 s/epoch at b16 — probe_e2e round 4);
        # stacking first makes it one transfer.
        self._stack_metrics = jax.jit(
            lambda ms: jnp.stack([jnp.stack(tuple(m)) for m in ms]))

    # ------------------------------------------------------------------

    def train(self, progress: bool = True) -> None:
        from tactile_gan_tpu.utils.profiling import nan_guard, trace

        cfg = self.cfg
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)
        # Ambient mesh for the whole epoch loop: Pallas kernels detect it at
        # trace time and shard_map themselves over the data axis (jax 0.9
        # Mosaic calls need Manual axes — see ops/pallas/instance_norm.py).
        mesh_ctx = (jax.sharding.set_mesh(self.mesh)
                    if self.mesh is not None else _null_cm())
        with mesh_ctx:
            self._train_epochs(progress, nan_guard, trace)

    def _train_epochs(self, progress, nan_guard, trace) -> None:
        cfg = self.cfg
        for i in range(cfg.total_epochs):
            epoch = i + cfg.initial_epoch
            apply_gp = (cfg.reg_every != 0 and epoch % cfg.reg_every == 0
                        and cfg.lambda_gp != 0)
            t0 = time.time()
            profile_this_epoch = bool(cfg.profile_dir) and i == 0
            profiler_cm = (trace(cfg.profile_dir) if profile_this_epoch
                           else _null_cm())
            metrics = []
            with profiler_cm:
                # Device-side input prefetch: the H2D copy of batch k+1 is
                # enqueued before batch k's step is awaited, so the transfer
                # rides under the running step (the host loader already
                # double-buffers decode; this double-buffers the device copy).
                staged = None
                host_aug = (cfg.host_aug and not cfg.no_aug
                            and self.dataset.aug)
                for src_u8, tgt_u8, _ in self.dataset.batches(
                        cfg.batch_size, shuffle=True, seed=cfg.seed + epoch,
                        drop_last=not self.pad_mode, pad_to_batch=self.pad_mode,
                        threads=cfg.threads, local_rows=self._local_rows,
                        host_augment=host_aug,
                        augment_seed=cfg.seed + 7919 * epoch):
                    nxt = self._h2d.submit(self._put_batch, src_u8, tgt_u8)
                    if staged is not None:
                        self.state, m = self.step_fn(self.state,
                                                     *staged.result(),
                                                     self.train_key,
                                                     apply_gp=apply_gp)
                        metrics.append(m)
                    staged = nxt
                if staged is not None:
                    self.state, m = self.step_fn(self.state, *staged.result(),
                                                 self.train_key,
                                                 apply_gp=apply_gp)
                    metrics.append(m)
                if profile_this_epoch:
                    jax.block_until_ready(metrics[-1])

            # One host sync per epoch (the reference syncs 5x per step),
            # as ONE device buffer: fetching the raw metrics list costs a
            # relay round-trip per scalar (5 x steps_per_epoch).
            fetched = np.asarray(jax.device_get(
                self._stack_metrics(metrics)), np.float32)
            self.epoch_seconds.append(time.time() - t0)
            keys = ("loss_d", "loss_g", "loss_l1", "loss_gp", "loss_per")
            per_step_means = fetched.mean(axis=0)
            means = {k: float(per_step_means[metrics[0]._fields.index(k)])
                     for k in keys}
            if cfg.debug_nans:
                nan_guard(means, step_info=f"(epoch {epoch})")
            self.disc_loss.append(means["loss_d"])
            self.gen_loss.append(means["loss_g"])
            self.l1_loss.append(means["loss_l1"])
            self.gp_loss.append(means["loss_gp"])
            self.per_loss.append(means["loss_per"])

            if progress and self.is_main_process:
                dt = self.epoch_seconds[-1]
                # The reference prints the POST-scheduler.step() lr
                # (/root/reference/train.py:172-178), i.e. next epoch's value;
                # step_offset keeps the print correct on --continue_training.
                lr_now = float(self._schedule(
                    self.step_offset + (i + 1) * self.steps_per_epoch))
                print(f"==training epoch {epoch}")
                print(f"\tloss functions => D:{means['loss_d']:.5f}, "
                      f"G:{means['loss_g']:.5f}, L1:{means['loss_l1']:.5f}, "
                      f"gp:{means['loss_gp']:.5f}, per:{means['loss_per']:.5f}")
                print(f"\tlearning rate: {lr_now:.5f}")
                print(f"\ttook {dt:.2f} seconds")
                print(f"\tapproximately {dt * (cfg.total_epochs - epoch):.2f} "
                      f"seconds left")

            if (cfg.checkpoint_interval != -1
                    and epoch % cfg.checkpoint_interval == 0):
                if self._orbax is not None:
                    # Sharded async save, collective across processes; the
                    # device buffers are copied out before save() returns,
                    # so next epoch's donated step is safe.
                    self._orbax.save(int(jax.device_get(self.state.step)),
                                     self.state)
                else:
                    # All processes participate in the (possible) gather
                    # collective; only process 0 touches disk. Async: the
                    # disk IO overlaps the next epoch's device work.
                    state = self._host_state()
                    if self.is_main_process:
                        self._async_ckpt.save(
                            os.path.join(cfg.work_root, "checkpoints",
                                         cfg.folder_save,
                                         f"model_{epoch}.pth"),
                            gen=state.g_params, disc=state.d_params,
                            opt_g=state.g_opt_state, opt_d=state.d_opt_state,
                            step=int(state.step))
        self._async_ckpt.wait()
        if self._orbax is not None:
            self._orbax.wait()

    def _put_batch(self, src_u8, tgt_u8):
        """Asynchronously stage one host batch onto the device/mesh."""
        if self.mesh is not None:
            return shard_batch(self.mesh, src_u8, tgt_u8)
        return jax.device_put(src_u8), jax.device_put(tgt_u8)

    def _host_state(self):
        """Fetch the full TrainState to host memory. When tensor-parallel
        shards span processes, an all-gather (jitted identity with replicated
        out-sharding) makes every leaf addressable first — device_get of a
        remote shard is impossible. Collective: every process must call."""
        if (self.mesh is not None and jax.process_count() > 1
                and self.mesh.shape.get("model", 1) > 1):
            from tactile_gan_tpu.parallel.mesh import replicate_sharding
            gather = jax.jit(lambda x: x,
                             out_shardings=replicate_sharding(self.mesh))
            return jax.device_get(gather(self.state))
        return jax.device_get(self.state)

    # ------------------------------------------------------------------
    # Artifacts (names match /root/reference/train.py:197-227).
    # ------------------------------------------------------------------

    def save_model(self, modelpath: str) -> None:
        state = self._host_state()  # collective — call from every process
        if not self.is_main_process:
            return
        save_checkpoint(modelpath, gen=state.g_params, disc=state.d_params,
                        opt_g=state.g_opt_state, opt_d=state.d_opt_state,
                        step=int(state.step))

    def save_arrays(self, path: str) -> None:
        np.save(os.path.join(path, "genloss"), np.asarray(self.gen_loss))
        np.save(os.path.join(path, "discloss"), np.asarray(self.disc_loss))
        np.save(os.path.join(path, "l1loss"), np.asarray(self.l1_loss))
        np.save(os.path.join(path, "perloss"), np.asarray(self.per_loss))
        np.save(os.path.join(path, "gploss"), np.asarray(self.gp_loss))

    def save_hyper_params(self, folderpath: str) -> None:
        extra = {}
        if self.cfg.lambda_per != 0 and self.cfg.version == 1:
            # Record whether v1 trained against real or random VGG features
            # (test-time readers ignore unknown keys, reference included).
            extra["vgg_random_fallback"] = self.vgg_random_fallback
        self.cfg.save_params(folderpath, extra=extra)

    def run_and_save(self, progress: bool = True) -> str:
        """Full train + artifact dump, like the reference __main__
        (/root/reference/train.py:259-277). Returns the model dir."""
        cfg = self.cfg
        save_path = cfg.models_dir()
        if self.is_main_process:
            mkdir(os.path.join(cfg.work_root, "checkpoints", cfg.folder_save))
            mkdir(save_path)
        self.train(progress=progress)
        self.save_model(os.path.join(save_path, "final_model.pth"))
        if self.is_main_process:
            self.save_arrays(save_path)
            self.save_hyper_params(save_path)
        return save_path
