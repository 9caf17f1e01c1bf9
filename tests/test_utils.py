"""Unit tests for utils: async checkpointing, profiling helpers, RNG streams,
VGG weight loading."""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tactile_gan_tpu.core import rng as rng_streams
from tactile_gan_tpu.utils.checkpoint import AsyncCheckpointer, load_checkpoint
from tactile_gan_tpu.utils.profiling import StepTimer, nan_guard


def test_async_checkpointer(tmp_path):
    ck = AsyncCheckpointer()
    path = os.path.join(str(tmp_path), "ckpt", "model_1.pth")
    ck.save(path, gen={"w": np.arange(4.0)}, disc={}, opt_g={}, opt_d={}, step=1)
    ck.save(os.path.join(str(tmp_path), "ckpt", "model_2.pth"),
            gen={"w": np.arange(4.0) * 2}, disc={}, opt_g={}, opt_d={}, step=2)
    ck.wait()
    a = load_checkpoint(path)
    b = load_checkpoint(os.path.join(str(tmp_path), "ckpt", "model_2.pth"))
    np.testing.assert_array_equal(a["gen"]["w"], np.arange(4.0))
    assert b["step"] == 2


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        t.start()
        time.sleep(0.01)
        t.stop()
    s = t.summary()
    assert s["steps"] == 3
    assert 0.005 < s["p50_s"] < 0.5


def test_nan_guard():
    nan_guard({"loss": 1.0})
    with pytest.raises(FloatingPointError):
        nan_guard({"loss": float("nan")})
    with pytest.raises(FloatingPointError):
        nan_guard({"loss": float("inf")}, step_info="(epoch 3)")


def test_rng_streams_disjoint():
    root = rng_streams.root_key(21)
    a = rng_streams.stream(root, rng_streams.STREAM_AUGMENT)
    b = rng_streams.stream(root, rng_streams.STREAM_LABEL_SMOOTHING)
    ra = jax.random.normal(a, (8,))
    rb = jax.random.normal(b, (8,))
    assert not np.allclose(np.asarray(ra), np.asarray(rb))
    # per-step folding is deterministic
    s1 = rng_streams.per_step(a, 5)
    s2 = rng_streams.per_step(a, 5)
    np.testing.assert_array_equal(
        np.asarray(jax.random.normal(s1, (4,))),
        np.asarray(jax.random.normal(s2, (4,))))


def test_vgg_weights_load_from_npz(tmp_path):
    """A torchvision-style .npz round-trips into HWIO params."""
    from tactile_gan_tpu.models.vgg import load_vgg_features, vgg_features_apply

    rng = np.random.default_rng(0)
    arrays = {}
    cin = 3
    for idx, cout in ((0, 64), (2, 64), (5, 128), (7, 128), (10, 256),
                      (12, 256), (14, 256), (17, 512), (19, 512), (21, 512)):
        arrays[f"features.{idx}.weight"] = rng.normal(
            scale=0.05, size=(cout, cin, 3, 3)).astype(np.float32)
        arrays[f"features.{idx}.bias"] = np.zeros(cout, np.float32)
        cin = cout
    path = os.path.join(str(tmp_path), "vgg.npz")
    np.savez(path, **arrays)

    params = load_vgg_features(path)
    k = params["features.0.kernel"]
    assert k.shape == (3, 3, 3, 64)  # HWIO
    np.testing.assert_allclose(
        np.asarray(k), arrays["features.0.weight"].transpose(2, 3, 1, 0))
    feats = vgg_features_apply(params, jnp.zeros((1, 32, 32, 3)))
    assert [f.shape[-1] for f in feats] == [64, 128, 256, 512]


def test_mkdir_idempotent(tmp_path):
    from tactile_gan_tpu.utils.io import mkdir
    p = os.path.join(str(tmp_path), "a", "b")
    mkdir(p)
    mkdir(p)
    assert os.path.isdir(p)
