"""Eval tests: fuzzy/binary metric goldens vs the reference implementation,
otsu threshold parity, visualization helpers, and the full test.py artifact
tree from a trained tiny model (integration)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from tactile_gan_tpu.eval.metrics import eval_pair, otsu_threshold
from tactile_gan_tpu.eval.visualize import (
    compose_channels, concat_images, to_pil,
)

from test_data import make_dataset
from test_train import build_dataset, tiny_cfg

RNG = np.random.default_rng(23)


# ---------------------------------------------------------------------------
# Metric goldens vs the reference (pure numpy/torch — CPU-safe).
# ---------------------------------------------------------------------------

def test_fuzzy_metrics_match_reference(reference_available):
    if not reference_available:
        pytest.skip("reference checkout unavailable")
    import torch
    from torch_ref import import_ref_test
    ref_test = import_ref_test()

    r = RNG.uniform(size=(3, 16, 16)).astype(np.float32)
    o = RNG.uniform(size=(3, 16, 16)).astype(np.float32)
    theirs = ref_test.eval_pair(torch.tensor(r), torch.tensor(o), fuzzy=True)
    ours = eval_pair(r, o, fuzzy=True)
    for k in ("accuracy", "dice", "jaccard"):
        np.testing.assert_allclose(ours[k], float(theirs[k]), rtol=1e-5)


def test_binary_metrics_match_reference(reference_available):
    if not reference_available:
        pytest.skip("reference checkout unavailable")
    import torch
    from torch_ref import import_ref_test
    ref_test = import_ref_test()

    r = RNG.uniform(size=(3, 16, 16)).astype(np.float32)
    o = RNG.uniform(size=(3, 16, 16)).astype(np.float32)
    theirs = ref_test.eval_pair(torch.tensor(r), torch.tensor(o), fuzzy=False,
                                thresh=0.4)
    ours = eval_pair(r, o, fuzzy=False, thresh=0.4)
    for k in ("accuracy", "dice", "jaccard"):
        np.testing.assert_allclose(ours[k], float(theirs[k]), rtol=1e-6)


def test_otsu_matches_reference(reference_available):
    if not reference_available:
        pytest.skip("reference checkout unavailable")
    from torch_ref import import_ref_util
    ref_util = import_ref_util()
    img = np.concatenate([RNG.uniform(0.0, 0.3, 500),
                          RNG.uniform(0.7, 1.0, 500)])
    assert otsu_threshold(img) == pytest.approx(
        float(ref_util.otsu_threshold(img)), abs=1e-9)


def test_fuzzy_identical_is_perfect():
    r = RNG.uniform(size=(3, 8, 8)).astype(np.float32)
    res = eval_pair(r, r, fuzzy=True)
    assert res["accuracy"] == pytest.approx(1.0)
    assert res["dice"] == pytest.approx(1.0)
    assert res["jaccard"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# Visualization helpers.
# ---------------------------------------------------------------------------

def test_concat_images():
    a = Image.new("RGB", (4, 6), (255, 0, 0))
    b = Image.new("RGB", (4, 6), (0, 255, 0))
    h = concat_images(a, b, mode="h")
    v = concat_images(a, b, mode="v")
    assert h.size == (8, 6) and v.size == (4, 12)
    assert h.getpixel((0, 0)) == (255, 0, 0)
    assert h.getpixel((5, 0)) == (0, 255, 0)


def test_compose_channels_shapes_and_colors():
    out = np.zeros((16, 16, 3), np.float32)
    out[:, :, 1] = 1.0  # full grid layer
    img = compose_channels(out)
    assert img.size == (16, 16)
    # axes channel 0 everywhere → inverted base white; grid pasted blue on top
    assert img.getpixel((3, 3)) == (0, 0, 255)


def test_to_pil_clamps():
    arr = np.array([[[-0.5], [1.5]]], np.float32)
    img = to_pil(arr)
    assert list(img.getdata()) == [0, 255]


def test_quantize_u8_bit_exact():
    """The on-device quantizer must reproduce the host writers' f64
    round-half-even byte-for-byte: the plain f32 round(x*255) it replaces is
    off-by-one on values whose exact product sits within an f32 ulp of a .5
    boundary (a few pixels per image)."""
    from tactile_gan_tpu.eval.runner import _quantize_u8
    from tactile_gan_tpu.eval.visualize import _u8

    rng = np.random.default_rng(7)
    cases = [rng.uniform(-0.1, 1.1, 200_000).astype(np.float32)]
    # adversarial: every half-integer product boundary, +/- a few f32 ulps
    ks = np.arange(255, dtype=np.float64)
    bounds = ((ks + 0.5) / 255.0).astype(np.float32)
    for steps in range(-4, 5):
        b = bounds.copy()
        for _ in range(abs(steps)):
            b = np.nextafter(b, np.float32(2.0 if steps > 0 else -2.0))
        cases.append(b)
    # the one exactly representable tie (255 * 0.5 = 127.5), and the ends
    cases.append(np.array([0.5, 0.0, 1.0, -1.0, 2.0], np.float32))
    x = np.concatenate(cases)
    ours = np.asarray(_quantize_u8(jnp.asarray(x)))
    host = _u8(x)
    np.testing.assert_array_equal(ours, host)
    # bf16 inputs (bf16-resident forward outputs) take the same path
    xb = jnp.asarray(x[:4096], jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(_quantize_u8(xb)),
                                  _u8(np.asarray(xb, np.float32)))


def test_fuzzy_sums_match_eval_pair():
    from tactile_gan_tpu.eval.runner import _fuzzy_sums

    rng = np.random.default_rng(11)
    out = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    tgt = rng.integers(0, 255, (2, 16, 16, 3), dtype=np.uint8)
    sums = np.asarray(_fuzzy_sums(jnp.asarray(out), jnp.asarray(tgt)),
                      np.float64)
    for k in range(2):
        ref = eval_pair(tgt[k].astype(np.float32) / 255.0, out[k], fuzzy=True)
        s_min, s_r, s_or, s_sq = sums[k]
        np.testing.assert_allclose(s_min / s_r, ref["accuracy"], rtol=1e-6)
        np.testing.assert_allclose(2 * s_or / s_sq, ref["dice"], rtol=1e-6)
        np.testing.assert_allclose(s_or / (s_sq - s_or), ref["jaccard"],
                                   rtol=1e-6)


# ---------------------------------------------------------------------------
# Integration: train tiny model → test.py-equivalent artifact tree.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("target", ["rgb", "ch"])
def test_full_eval_artifact_tree(tmp_path, target):
    from tactile_gan_tpu.eval.runner import evaluate_folder
    from tactile_gan_tpu.train import Trainer

    cfg = tiny_cfg(tmp_path, target=target, total_epochs=1,
                   folder_save="evalrun", folder_load="evalrun")
    ds = build_dataset(cfg, n=4)
    tr = Trainer(cfg, ds, use_mesh=False)
    tr.run_and_save(progress=False)

    # test split
    make_dataset(cfg.data.replace("train", "train"), n=2,
                 size=cfg.image_size, target=target)
    test_src = os.path.join(cfg.data, "train", "source")  # reuse as test data
    os.makedirs(os.path.join(cfg.data, "test"), exist_ok=True)
    if not os.path.exists(os.path.join(cfg.data, "test", "source")):
        os.symlink(os.path.join(cfg.data, "train", "source"),
                   os.path.join(cfg.data, "test", "source"))
        os.symlink(os.path.join(cfg.data, "train", "tactile"),
                   os.path.join(cfg.data, "test", "tactile"))

    metrics = evaluate_folder("evalrun", work_root=cfg.work_root)
    assert metrics is not None
    out_dir = os.path.join(cfg.work_root, "Outputs", "evalrun")
    assert os.path.exists(os.path.join(out_dir, "eval.txt"))
    assert os.path.exists(os.path.join(out_dir, "loss.png"))
    for dist in ("accuracy", "dice", "jaccard"):
        assert os.path.exists(os.path.join(out_dir, f"{dist}_dist.png"))
    n_out = len(os.listdir(os.path.join(out_dir, "out")))
    assert n_out == 4
    assert len(os.listdir(os.path.join(out_dir, "sgt"))) == 4
    if target == "ch":
        assert len(os.listdir(os.path.join(out_dir, "elm"))) == 4
    # metrics are sane numbers
    assert 0.0 <= metrics["dice"] <= 1.0


def test_batched_eval_matches_per_image(tmp_path):
    """--eval_batch produces identical metrics and artifacts to the
    reference's per-image loop (tail padded)."""
    from tactile_gan_tpu.eval.runner import load_model, test_model
    from tactile_gan_tpu.train import Trainer

    cfg = tiny_cfg(tmp_path, total_epochs=1, folder_save="bev",
                   folder_load="bev")
    ds = build_dataset(cfg, n=5)
    Trainer(cfg, ds, use_mesh=False).run_and_save(progress=False)
    fwd1, _ = load_model(os.path.join(cfg.models_dir(), "final_model.pth"), cfg)

    out1 = os.path.join(str(tmp_path), "per_image")
    a1, d1, j1 = test_model(fwd1, ds, out1, evaluation=True,
                            target_mode="rgb", eval_batch=1)
    out2 = os.path.join(str(tmp_path), "batched")
    a2, d2, j2 = test_model(fwd1, ds, out2, evaluation=True,
                            target_mode="rgb", eval_batch=4)
    np.testing.assert_allclose(a1, a2, rtol=1e-6)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
    assert len(os.listdir(os.path.join(out2, "out"))) == 5
    # pixel-identical artifacts
    img1 = np.asarray(Image.open(os.path.join(out1, "out", "3.png")))
    img2 = np.asarray(Image.open(os.path.join(out2, "out", "3.png")))
    np.testing.assert_array_equal(img1, img2)


def test_eval_u8_transfer_matches_f32_and_never_recompiles(tmp_path):
    """The default 'u8' transfer (on-device quantize + metric sums) must
    produce byte-identical PNG artifacts and ~f64-identical metrics vs the
    legacy 'f32' path — and repeated eval calls with the same forward must
    hit the cached jit with ZERO new compiles (VERDICT r4: rebuilding
    jax.jit per call made every 'warm' eval recompile through the relay,
    producing the bogus 0.24 img/s round-4 measurement)."""
    from tactile_gan_tpu.eval import runner
    from tactile_gan_tpu.eval.runner import load_model, test_model
    from tactile_gan_tpu.train import Trainer

    cfg = tiny_cfg(tmp_path, total_epochs=1, folder_save="u8t",
                   folder_load="u8t")
    ds = build_dataset(cfg, n=5)
    Trainer(cfg, ds, use_mesh=False).run_and_save(progress=False)
    fwd, _ = load_model(os.path.join(cfg.models_dir(), "final_model.pth"),
                        cfg)

    out_u8 = os.path.join(str(tmp_path), "u8")
    out_f32 = os.path.join(str(tmp_path), "f32")
    a1, d1, j1 = test_model(fwd, ds, out_u8, evaluation=True,
                            target_mode="rgb", eval_batch=2, transfer="u8")
    a2, d2, j2 = test_model(fwd, ds, out_f32, evaluation=True,
                            target_mode="rgb", eval_batch=2, transfer="f32")
    # metrics: device f32 sums vs host f64 sums — ~1e-6 relative
    np.testing.assert_allclose(a1, a2, rtol=1e-5)
    np.testing.assert_allclose(d1, d2, rtol=1e-5)
    np.testing.assert_allclose(j1, j2, rtol=1e-5)
    # artifacts: byte-identical (on-device quantizer is bit-exact)
    for sub in ("out", "sgt"):
        for name in sorted(os.listdir(os.path.join(out_u8, sub))):
            b1 = open(os.path.join(out_u8, sub, name), "rb").read()
            b2 = open(os.path.join(out_f32, sub, name), "rb").read()
            assert b1 == b2, f"{sub}/{name} differs between u8/f32 transfer"

    # no-recompile guard: a second identical run must add zero jit entries
    jits = runner._JIT_CACHE[fwd]
    sizes = {k: j._cache_size() for k, j in jits.items()}
    test_model(fwd, ds, os.path.join(str(tmp_path), "rerun"),
               evaluation=True, target_mode="rgb", eval_batch=2,
               transfer="u8")
    assert {k: j._cache_size() for k, j in jits.items()} == sizes


def test_two_step_runner(tmp_path):
    """Chain two tiny generators: rgb-stage then ch-stage."""
    from tactile_gan_tpu.eval.runner import load_model, test_two_step
    from tactile_gan_tpu.train import Trainer

    cfg1 = tiny_cfg(tmp_path, target="rgb", total_epochs=1,
                    folder_save="s1", folder_load="s1")
    ds1 = build_dataset(cfg1, n=2)
    Trainer(cfg1, ds1, use_mesh=False).run_and_save(progress=False)

    cfg2 = tiny_cfg(tmp_path, target="ch", total_epochs=1,
                    folder_save="s2", folder_load="s2")
    ds2 = build_dataset(cfg2, n=2)
    Trainer(cfg2, ds2, use_mesh=False).run_and_save(progress=False)

    f1, _ = load_model(os.path.join(cfg1.models_dir(), "final_model.pth"), cfg1)
    f2, _ = load_model(os.path.join(cfg2.models_dir(), "final_model.pth"), cfg2)

    out_dir = os.path.join(str(tmp_path), "two_step_out")
    acc, dice, jac = test_two_step(f1, f2, ds2, out_dir, evaluation=True)
    assert len(acc) == 2
    assert os.path.exists(os.path.join(out_dir, "out", "1.png"))
    assert os.path.exists(os.path.join(out_dir, "elm", "2.png"))


def test_eval_resolves_model_via_params_folder_save(tmp_path, capsys):
    """The reference loads the model + loss arrays from the params.txt-
    RECORDED folder_save, not the --folder argument
    (/root/reference/test.py:240-246). A params.txt copied into an alias
    directory must still evaluate the real save folder. Also: a recorded
    vgg_random_fallback must be surfaced at eval time."""
    import json
    import shutil

    from tactile_gan_tpu.eval.runner import evaluate_folder
    from tactile_gan_tpu.train import Trainer

    cfg = tiny_cfg(tmp_path, total_epochs=1, folder_save="realsave",
                   folder_load="realsave")
    ds = build_dataset(cfg, n=2)
    Trainer(cfg, ds, use_mesh=False).run_and_save(progress=False)
    os.makedirs(os.path.join(cfg.data, "test"), exist_ok=True)
    os.symlink(os.path.join(cfg.data, "train", "source"),
               os.path.join(cfg.data, "test", "source"))
    os.symlink(os.path.join(cfg.data, "train", "tactile"),
               os.path.join(cfg.data, "test", "tactile"))

    # Alias dir holds ONLY params.txt (tagged with the fallback marker);
    # model + loss arrays stay in models/realsave.
    alias_dir = os.path.join(cfg.work_root, "models", "alias")
    os.makedirs(alias_dir)
    with open(os.path.join(cfg.models_dir(), "params.txt")) as f:
        params = json.load(f)
    params["vgg_random_fallback"] = True
    with open(os.path.join(alias_dir, "params.txt"), "w") as f:
        f.write(json.dumps(params))

    metrics = evaluate_folder("alias", work_root=cfg.work_root)
    assert metrics is not None
    # Outputs land under the recorded folder_save, like the reference.
    assert os.path.exists(os.path.join(cfg.work_root, "Outputs", "realsave",
                                       "eval.txt"))
    assert "RANDOM" in capsys.readouterr().out  # fallback banner surfaced
