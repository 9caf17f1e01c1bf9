"""Training subsystem tests: LR schedule goldens vs torch, end-to-end tiny
training runs with artifact checks, checkpoint save/resume, GP epoch gating,
and all four GAN modes through the jitted step."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from tactile_gan_tpu.core.config import TrainConfig
from tactile_gan_tpu.data.dataset import PairedDataset
from tactile_gan_tpu.train import Trainer, multistep_lr
from tactile_gan_tpu.train.schedule import milestones
from tactile_gan_tpu.utils.checkpoint import (
    load_checkpoint, restore_partial, save_checkpoint,
)

from test_data import make_dataset


def tiny_cfg(tmp_path, **kw):
    defaults = dict(
        data=os.path.join(str(tmp_path), "train_data", "dsdata"),
        gen="UNet++", nf=4, batch_size=2, image_size=32, total_epochs=2,
        epoch_constant=1, loss="ls", lambda_per=0.0, lambda_gp=0.0,
        compute_dtype="float32", threads=2, target="rgb", no_aug=True,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def build_dataset(cfg, n=4):
    root = cfg.data
    src_dir = make_dataset(root, n=n, size=cfg.image_size, target=cfg.target)
    return PairedDataset(src_dir, size=cfg.image_size, mode="train",
                         aug=not cfg.no_aug, target=cfg.target)


# ---------------------------------------------------------------------------
# LR schedule golden vs torch MultiStepLR.
# ---------------------------------------------------------------------------

def test_multistep_schedule_matches_torch():
    """Per-epoch lr sequence must equal torch MultiStepLR(gamma=.8) at the
    reference milestones (/root/reference/train.py:191-195)."""
    lr0, epoch_constant, total_epochs, spe = 0.001, 25, 135, 7
    sched = multistep_lr(lr0, epoch_constant, total_epochs, spe)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr0)
    ms = [int(m) for m in milestones(epoch_constant, total_epochs)]
    tsched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=ms, gamma=0.8)

    ours, theirs = [], []
    for epoch in range(total_epochs):
        ours.append(float(sched(epoch * spe)))          # lr during this epoch
        theirs.append(opt.param_groups[0]["lr"])
        tsched.step()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)
    # within an epoch the lr is constant
    assert float(sched(3 * spe)) == float(sched(3 * spe + spe - 1))


def test_milestones_match_reference_formula():
    got = milestones(25, 135)
    want = np.int16(np.linspace(25, 135, 11)[:-1])
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# End-to-end tiny runs.
# ---------------------------------------------------------------------------

def test_train_two_epochs_artifacts(tmp_path):
    cfg = tiny_cfg(tmp_path)
    ds = build_dataset(cfg)
    tr = Trainer(cfg, ds, use_mesh=False)
    save_path = tr.run_and_save(progress=False)

    assert os.path.exists(os.path.join(save_path, "final_model.pth"))
    for name in ("genloss", "discloss", "l1loss", "perloss", "gploss"):
        arr = np.load(os.path.join(save_path, f"{name}.npy"))
        assert arr.shape == (cfg.total_epochs,)
        assert np.all(np.isfinite(arr))

    with open(os.path.join(save_path, "params.txt")) as f:
        params = json.load(f)
    # reference-compatible key set present with matching values
    for k in TrainConfig._REFERENCE_KEYS:
        assert k in params
    assert params["gen"] == "UNet++" and params["batch_size"] == 2
    rehydrated = TrainConfig.from_params_file(
        os.path.join(save_path, "params.txt"))
    assert rehydrated == cfg


def test_reference_params_txt_loads():
    """A params.txt written by the PyTorch reference (its opt.__dict__) must
    rehydrate without error, extensions defaulting."""
    ref_params = {
        "data": "./data", "batch_size": 4, "input_dim": 3, "output_dim": 3,
        "initial_epoch": 1, "total_epochs": 135, "epoch_constant": 25,
        "lr": 0.001, "no_label_smoothing": False, "beta1": 0.9, "threads": 8,
        "lambda_a": 1, "lambda_gp": 0.01, "lambda_per": 1,
        "w_per": [0, 0.1, 0.3, 0.6], "gen": "UNet++", "nf": 64, "loss": "ls",
        "no_aug": False, "target": "rgb", "version": 1,
        "folder_save": "pix2obj", "folder_load": "pix2obj",
        "checkpoint_interval": -1, "continue_training": False, "reg_every": 1,
    }
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        json.dump(ref_params, f)
        path = f.name
    cfg = TrainConfig.from_params_file(path)
    assert cfg.gen == "UNet++" and cfg.activation is True
    assert cfg.seed == 21 and cfg.version == 1
    os.unlink(path)


@pytest.mark.parametrize("loss", ["ce", "w", "hinge"])
def test_all_gan_modes_one_epoch(tmp_path, loss):
    cfg = tiny_cfg(tmp_path, loss=loss, total_epochs=1,
                   lambda_gp=0.01 if loss in ("w", "hinge") else 0.0)
    assert cfg.activation is False  # only 'ls' gets the tanh/sigmoid pair
    ds = build_dataset(cfg)
    tr = Trainer(cfg, ds, use_mesh=False)
    tr.train(progress=False)
    assert np.isfinite(tr.gen_loss[0]) and np.isfinite(tr.disc_loss[0])


def test_version1_vgg_fallback_step(tmp_path):
    cfg = tiny_cfg(tmp_path, lambda_per=0.5, version=1, total_epochs=1)
    ds = build_dataset(cfg)
    tr = Trainer(cfg, ds, use_mesh=False)
    tr.train(progress=False)
    assert tr.per_loss[0] > 0.0


def test_version2_pan_loss_logged(tmp_path):
    cfg = tiny_cfg(tmp_path, lambda_per=0.5, version=2, total_epochs=1)
    ds = build_dataset(cfg)
    tr = Trainer(cfg, ds, use_mesh=False)
    tr.train(progress=False)
    assert tr.per_loss[0] > 0.0


def test_ch_task_with_augmentation(tmp_path):
    """Task-2 channel-wise target + joint augmentation through the full
    train step (BASELINE config #5)."""
    cfg = tiny_cfg(tmp_path, target="ch", no_aug=False, total_epochs=1)
    ds = build_dataset(cfg)
    assert ds.aug
    tr = Trainer(cfg, ds, use_mesh=False)
    tr.train(progress=False)
    assert np.isfinite(tr.gen_loss[0])


def test_checkpoint_interval_gating(tmp_path):
    """checkpoint_interval saves model_{epoch}.pth when epoch % interval == 0
    (/root/reference/train.py:187-188)."""
    cfg = tiny_cfg(tmp_path, total_epochs=4, checkpoint_interval=2,
                   initial_epoch=1, folder_save="ckgate")
    ds = build_dataset(cfg)
    tr = Trainer(cfg, ds, use_mesh=False)
    tr.train(progress=False)
    tr._async_ckpt.wait()
    ck_dir = os.path.join(cfg.work_root, "checkpoints", "ckgate")
    saved = sorted(os.listdir(ck_dir))
    # epochs 1..4 -> saves at 2 and 4
    assert saved == ["model_2.pth", "model_4.pth"]


def test_gp_epoch_gating(tmp_path):
    """reg_every=2: GP only on even epochs (epoch = i + initial_epoch;
    /root/reference/train.py:123)."""
    cfg = tiny_cfg(tmp_path, lambda_gp=0.1, reg_every=2, total_epochs=4,
                   initial_epoch=1)
    ds = build_dataset(cfg)
    tr = Trainer(cfg, ds, use_mesh=False)
    tr.train(progress=False)
    gp = np.asarray(tr.gp_loss)
    # epochs 1,2,3,4 -> gp on 2 and 4
    assert gp[0] == 0.0 and gp[2] == 0.0
    assert gp[1] > 0.0 and gp[3] > 0.0


# ---------------------------------------------------------------------------
# Checkpointing.
# ---------------------------------------------------------------------------

def test_training_is_deterministic(tmp_path):
    """Two Trainers with the same seed and data produce bit-identical loss
    curves — the explicit-PRNG replacement for the reference's global
    seed-21 (util.py:8-11)."""
    cfg = tiny_cfg(tmp_path, total_epochs=2, no_aug=False,
                   no_label_smoothing=False)
    ds = build_dataset(cfg)
    t1 = Trainer(cfg, ds, use_mesh=False)
    t1.train(progress=False)
    t2 = Trainer(cfg, ds, use_mesh=False)
    t2.train(progress=False)
    assert t1.gen_loss == t2.gen_loss
    assert t1.disc_loss == t2.disc_loss
    assert t1.l1_loss == t2.l1_loss

    cfg3 = tiny_cfg(tmp_path, total_epochs=2, no_aug=False, seed=99)
    t3 = Trainer(cfg3, ds, use_mesh=False)
    t3.train(progress=False)
    assert t3.gen_loss != t1.gen_loss  # seed actually matters


def test_unet_rejects_small_inputs():
    import jax
    import jax.numpy as jnp
    from tactile_gan_tpu.models import UNet
    with pytest.raises(ValueError, match="at least 256x256"):
        UNet(output_dim=3, nf=4).init(jax.random.key(0),
                                      jnp.zeros((1, 64, 64, 3)))
    # 128px silently "works" arithmetically but hits a degenerate 1x1
    # instance-norm bottleneck the torch reference rejects — we reject too.
    with pytest.raises(ValueError, match="at least 256x256"):
        UNet(output_dim=3, nf=4).init(jax.random.key(0),
                                      jnp.zeros((1, 128, 128, 3)))


def test_checkpoint_roundtrip_and_resume(tmp_path):
    cfg = tiny_cfg(tmp_path, total_epochs=1, folder_save="m1", folder_load="m1")
    ds = build_dataset(cfg)
    tr = Trainer(cfg, ds, use_mesh=False)
    tr.run_and_save(progress=False)

    ckpt = load_checkpoint(os.path.join(cfg.models_dir(), "final_model.pth"))
    assert set(ckpt.keys()) == {"gen", "disc", "optimizerG_state_dict",
                                "optimizerD_state_dict", "step"}
    assert ckpt["step"] == tr.steps_per_epoch * cfg.total_epochs

    # Resume: params must match bit-exactly before any new step.
    cfg2 = tiny_cfg(tmp_path, total_epochs=1, folder_save="m2",
                    folder_load="m1", continue_training=True)
    tr2 = Trainer(cfg2, ds, use_mesh=False)
    a = jax.tree.leaves(jax.device_get(tr.state.g_params))
    b = jax.tree.leaves(jax.device_get(tr2.state.g_params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert int(tr2.state.step) == int(tr.state.step)
    # and training continues without error
    tr2.train(progress=False)


def test_restore_partial_is_strict_false(tmp_path):
    template = {"a": {"x": np.zeros(2), "y": np.ones(3)}, "b": np.ones(1)}
    incoming = {"a": {"x": np.full(2, 7.0)}}  # y and b missing
    merged = restore_partial(template, incoming)
    np.testing.assert_array_equal(merged["a"]["x"], np.full(2, 7.0))
    np.testing.assert_array_equal(merged["a"]["y"], np.ones(3))
    np.testing.assert_array_equal(merged["b"], np.ones(1))


def test_checkpoint_atomic_write(tmp_path):
    path = os.path.join(str(tmp_path), "ck", "final_model.pth")
    save_checkpoint(path, gen={"k": np.ones(2)}, disc={}, opt_g={}, opt_d={},
                    step=5)
    assert not os.path.exists(path + ".tmp")
    ck = load_checkpoint(path)
    assert ck["step"] == 5
    np.testing.assert_array_equal(ck["gen"]["k"], np.ones(2))
