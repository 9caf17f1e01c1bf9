"""CLI-level integration: the four entry-point scripts run end to end on a
tiny synthetic dataset (in-process, CPU backend from conftest)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from test_data import make_dataset

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_cli(name):
    """Load a repo-root CLI module by path under a collision-free name (the
    reference checkout also defines train/test modules on sys.path)."""
    spec = importlib.util.spec_from_file_location(
        f"cli_{name}", os.path.join(_REPO, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _mk_data(tmp_path, target="rgb", n=4, size=32):
    data_dir = os.path.join(str(tmp_path), "work", "data")
    make_dataset(data_dir, n=n, size=size, target=target)
    os.makedirs(os.path.join(data_dir, "test"), exist_ok=True)
    os.symlink(os.path.join(data_dir, "train", "source"),
               os.path.join(data_dir, "test", "source"))
    os.symlink(os.path.join(data_dir, "train", "tactile"),
               os.path.join(data_dir, "test", "tactile"))
    return data_dir


def test_train_then_test_cli(tmp_path):
    train_cli = _load_cli("train")
    test_cli = _load_cli("test")

    data_dir = _mk_data(tmp_path)
    work = os.path.dirname(data_dir)
    train_cli.main([
        "--data", data_dir, "--gen", "UNet++", "--nf", "4",
        "--batch_size", "2", "--image_size", "32", "--total_epochs", "1",
        "--lambda_per", "0", "--lambda_gp", "0", "--no_aug",
        "--compute_dtype", "float32", "--threads", "2",
        "--folder_save", "cli_run", "--folder_load", "cli_run",
    ])
    model_dir = os.path.join(work, "models", "cli_run")
    assert os.path.exists(os.path.join(model_dir, "final_model.pth"))
    assert os.path.exists(os.path.join(model_dir, "params.txt"))

    test_cli.main(["--folder", "cli_run", "--work_root", work])
    out_dir = os.path.join(work, "Outputs", "cli_run")
    assert os.path.exists(os.path.join(out_dir, "eval.txt"))
    assert len(os.listdir(os.path.join(out_dir, "out"))) == 4


def test_visualize_augmentation_cli(tmp_path):
    va = _load_cli("visualize_augmentation")

    data_dir = _mk_data(tmp_path, target="ch")
    out_dir = os.path.join(str(tmp_path), "vis")
    va.main(["--data_dir", os.path.join(data_dir, "train", "source"),
             "--output_dir", out_dir, "--num_samples", "2", "--size", "32",
             "--target_mode", "non_rgb"])
    files = sorted(os.listdir(out_dir))
    assert "sample_0_source_raw.png" in files
    assert "sample_0_source_aug.png" in files
    assert "sample_1_target_aug.png" in files


def test_two_step_cli(tmp_path):
    """two_step_test.py end to end: stage-1 rgb model chained into a
    stage-2 ch model, outputs under Outputs/{s1}+{s2}_{data}."""
    train_cli = _load_cli("train")
    ts_cli = _load_cli("two_step_test")

    data_dir = _mk_data(tmp_path, target="rgb", n=2)
    work = os.path.dirname(data_dir)
    common = ["--data", data_dir, "--nf", "4", "--batch_size", "2",
              "--image_size", "32", "--total_epochs", "1", "--lambda_per", "0",
              "--lambda_gp", "0", "--no_aug", "--compute_dtype", "float32",
              "--threads", "2"]
    train_cli.main(common + ["--target", "rgb", "--folder_save", "stage1",
                             "--folder_load", "stage1"])
    # stage 2 needs ch tactile components in the same data dir
    from test_data import make_dataset
    make_dataset(data_dir, n=2, size=32, target="ch")
    train_cli.main(common + ["--target", "ch", "--folder_save", "stage2",
                             "--folder_load", "stage2"])

    ts_cli.main(["--s1_dir", "stage1", "--s2_dir", "stage2",
                 "--data", os.path.join(data_dir), "--work_root", work])
    out_dir = os.path.join(work, "Outputs", f"stage1+stage2_{data_dir}")
    assert os.path.exists(os.path.join(out_dir, "eval.txt"))
    assert len(os.listdir(os.path.join(out_dir, "out"))) == 2


def test_trainer_pad_mode_small_dataset(tmp_path):
    """Datasets smaller than the batch pad-and-repeat to one static shape."""
    from tactile_gan_tpu.core.config import TrainConfig
    from tactile_gan_tpu.data.dataset import PairedDataset
    from tactile_gan_tpu.train import Trainer
    from test_data import make_dataset

    data_dir = os.path.join(str(tmp_path), "tiny")
    src = make_dataset(data_dir, n=3, size=32)
    cfg = TrainConfig(data=data_dir, gen="UNet++", nf=4, batch_size=4,
                      image_size=32, total_epochs=1, loss="ls",
                      lambda_per=0, lambda_gp=0, no_aug=True,
                      compute_dtype="float32", threads=2)
    ds = PairedDataset(src, mode="train", target="rgb")
    tr = Trainer(cfg, ds, use_mesh=False)
    assert tr.pad_mode and tr.steps_per_epoch == 1
    tr.train(progress=False)
    assert np.isfinite(tr.gen_loss[0])


def test_trainer_empty_dataset_raises(tmp_path):
    from tactile_gan_tpu.core.config import TrainConfig
    from tactile_gan_tpu.data.dataset import PairedDataset
    from tactile_gan_tpu.train import Trainer

    empty = os.path.join(str(tmp_path), "empty")
    os.makedirs(empty)
    cfg = TrainConfig(data=empty, nf=4, image_size=32)
    with pytest.raises(ValueError, match="no images"):
        Trainer(cfg, PairedDataset(empty), use_mesh=False)


def test_profile_dir_writes_trace(tmp_path):
    """--profile_dir dumps a jax.profiler trace of epoch 1."""
    from tactile_gan_tpu.core.config import TrainConfig
    from tactile_gan_tpu.data.dataset import PairedDataset
    from tactile_gan_tpu.train import Trainer
    from test_data import make_dataset

    data_dir = os.path.join(str(tmp_path), "profdata")
    src = make_dataset(data_dir, n=2, size=32)
    trace_dir = os.path.join(str(tmp_path), "trace")
    cfg = TrainConfig(data=data_dir, gen="UNet++", nf=4, batch_size=2,
                      image_size=32, total_epochs=1, loss="ls", lambda_per=0,
                      lambda_gp=0, no_aug=True, compute_dtype="float32",
                      threads=2, profile_dir=trace_dir)
    ds = PairedDataset(src, mode="train", target="rgb")
    Trainer(cfg, ds, use_mesh=False).train(progress=False)
    dumped = []
    for root, _, files in os.walk(trace_dir):
        dumped.extend(files)
    assert any(f.endswith(".xplane.pb") for f in dumped), dumped


def test_multiscale_gan_loss_list_input():
    """C9: list-of-predictions input averages per-scale losses
    (/root/reference/generators/generators.py:107-121)."""
    import jax.numpy as jnp
    from tactile_gan_tpu.losses import gan_loss

    a = jnp.full((1, 3, 3, 1), 0.3)
    b = jnp.full((1, 2, 2, 1), 0.9)
    single_a = gan_loss(a, True, mode="ls")
    single_b = gan_loss(b, True, mode="ls")
    combo = gan_loss([a, [None, b]], True, mode="ls")
    np.testing.assert_allclose(float(combo),
                               (float(single_a) + float(single_b)) / 2,
                               rtol=1e-6)
