"""Torch-checkpoint migration: a final_model.pth written by the PyTorch
reference (torch.save of its state dicts, /root/reference/train.py:203-209)
must load through our checkpoint loader and reproduce the reference model's
outputs — the switch-over path for users with already-trained models."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from tactile_gan_tpu.core.config import TrainConfig
from tactile_gan_tpu.eval.runner import load_model
from tactile_gan_tpu.utils.checkpoint import load_checkpoint
from tactile_gan_tpu.utils.torch_migrate import (
    detect_generator, is_torch_checkpoint,
)

from torch_ref import randomize_

RNG = np.random.default_rng(47)


def _save_reference_style_ckpt(tmp_path, gen_name="UNet++", nf=4):
    from discriminators.PatchDiscriminator import PatchDiscriminator as RefD
    if gen_name == "UNet++":
        from generators.UNet_plusplus import UNet_plusplus as RefG
        ref_g = RefG(3, 3, nf, activation=True)
    else:
        from generators.UNet import UNet as RefG
        ref_g = RefG(3, 3, nf, activation=True)
    ref_d = RefD(3, 3, num_filter=nf, return_filters=False, activation=True)
    randomize_(ref_g, seed=8)
    randomize_(ref_d, seed=9)
    path = os.path.join(str(tmp_path), "final_model.pth")
    # Exactly the reference's save format (train.py:203-209) minus optimizer
    # states (torch optimizer pickles need weights_only=False to load; the
    # migration path is weights-only by design).
    torch.save({"gen": ref_g.state_dict(), "disc": ref_d.state_dict()}, path)
    return ref_g, path


def test_torch_checkpoint_detected_and_converted(reference_available, tmp_path):
    if not reference_available:
        pytest.skip("reference checkout unavailable")
    ref_g, path = _save_reference_style_ckpt(tmp_path)
    assert is_torch_checkpoint(path)
    ckpt = load_checkpoint(path)
    assert set(ckpt) == {"gen", "disc", "step"}
    assert ckpt["step"] == 0
    k = ckpt["gen"]["params"]["node0_0"]["a"]["conv"]["kernel"]
    assert k.shape == (3, 3, 3, 4)  # HWIO


def test_generator_autodetection(reference_available, tmp_path):
    if not reference_available:
        pytest.skip("reference checkout unavailable")
    from generators.UNet import UNet as RefUNet
    sd = {k: v.numpy() for k, v in
          RefUNet(3, 3, 4, activation=True).state_dict().items()}
    assert detect_generator(sd)[0] == "UNet"
    with pytest.raises(ValueError):
        detect_generator({"foo.weight": np.zeros(1)})


def test_migrated_model_matches_reference_forward(reference_available,
                                                  tmp_path):
    """load_model on a torch .pth gives the same outputs as the reference."""
    if not reference_available:
        pytest.skip("reference checkout unavailable")
    ref_g, path = _save_reference_style_ckpt(tmp_path, gen_name="UNet++")

    cfg = TrainConfig(gen="UNet++", nf=4, image_size=64,
                      compute_dtype="float32")
    forward, _ = load_model(path, cfg)

    x = RNG.normal(size=(1, 3, 64, 64)).astype(np.float32)
    ref_g.eval()
    with torch.no_grad():
        theirs = ref_g(torch.tensor(x)).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(forward(jnp.array(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_continue_training_from_torch_checkpoint(reference_available,
                                                 tmp_path):
    """--continue_training accepts a reference .pth (weights restored, fresh
    optimizer) and keeps training."""
    if not reference_available:
        pytest.skip("reference checkout unavailable")
    from tactile_gan_tpu.data.dataset import PairedDataset
    from tactile_gan_tpu.train import Trainer
    from test_data import make_dataset

    data_root = os.path.join(str(tmp_path), "mig")
    src = make_dataset(data_root, n=2, size=32)
    # work_root is data.rsplit('/', 1)[0] (reference train.py:266-272)
    models_dir = os.path.join(str(tmp_path), "models", "legacy")
    os.makedirs(models_dir)
    _save_reference_style_ckpt(models_dir)

    cfg = TrainConfig(data=data_root, gen="UNet++", nf=4, batch_size=2,
                      image_size=32, total_epochs=1, loss="ls", lambda_per=0,
                      lambda_gp=0, no_aug=True, compute_dtype="float32",
                      threads=2, continue_training=True, folder_load="legacy",
                      folder_save="migrated")
    ds = PairedDataset(src, mode="train", target="rgb")
    tr = Trainer(cfg, ds, use_mesh=False)
    assert int(tr.state.step) == 0
    tr.train(progress=False)
    assert np.isfinite(tr.gen_loss[0])
