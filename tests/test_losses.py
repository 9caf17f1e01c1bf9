"""Loss goldens: the four GAN modes, label smoothing statistics, pan_loss and
gradient penalty vs the reference implementations (on CPU where the reference
is device-agnostic; hand-computed goldens where it hardcodes cuda)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as tF

from tactile_gan_tpu.losses import gan_loss, gradient_penalty, l1_loss, pan_loss
from tactile_gan_tpu.losses.perceptual import vgg_perceptual_loss
from tactile_gan_tpu.models import PatchDiscriminator
from tactile_gan_tpu.models.vgg import load_vgg_features, vgg_features_apply

from torch_ref import patchdisc_params, randomize_

RNG = np.random.default_rng(13)


def _logits():
    return RNG.normal(size=(2, 5, 5, 1)).astype(np.float32)


def test_ls_mode_matches_mse():
    x = _logits()
    got_real = gan_loss(jnp.array(x), True, mode="ls")
    got_fake = gan_loss(jnp.array(x), False, mode="ls")
    t = torch.tensor(x)
    np.testing.assert_allclose(
        float(got_real), float(tF.mse_loss(t, torch.ones_like(t))), rtol=1e-5)
    np.testing.assert_allclose(
        float(got_fake), float(tF.mse_loss(t, torch.zeros_like(t))), rtol=1e-5)


def test_ce_mode_matches_bce_with_logits():
    x = _logits()
    got_real = gan_loss(jnp.array(x), True, mode="ce")
    got_fake = gan_loss(jnp.array(x), False, mode="ce")
    t = torch.tensor(x)
    np.testing.assert_allclose(
        float(got_real),
        float(tF.binary_cross_entropy_with_logits(t, torch.ones_like(t))),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(got_fake),
        float(tF.binary_cross_entropy_with_logits(t, torch.zeros_like(t))),
        rtol=1e-5)


def test_w_mode():
    x = _logits()
    np.testing.assert_allclose(float(gan_loss(jnp.array(x), True, mode="w")),
                               -x.mean(), rtol=1e-5)
    np.testing.assert_allclose(float(gan_loss(jnp.array(x), False, mode="w")),
                               x.mean(), rtol=1e-5)


def test_hinge_mode_asymmetry():
    """D-real -mean(min(x-1,0)); D-fake -mean(min(-x-1,0)); G -mean(x)
    (/root/reference/generators/generators.py:88-99)."""
    x = _logits()
    np.testing.assert_allclose(
        float(gan_loss(jnp.array(x), True, mode="hinge", for_discriminator=True)),
        -np.minimum(x - 1, 0).mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(gan_loss(jnp.array(x), False, mode="hinge", for_discriminator=True)),
        -np.minimum(-x - 1, 0).mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(gan_loss(jnp.array(x), True, mode="hinge", for_discriminator=False)),
        -x.mean(), rtol=1e-5)
    with pytest.raises(ValueError):
        gan_loss(jnp.array(x), False, mode="hinge", for_discriminator=False)


def test_label_smoothing_statistics():
    """clamp(N(1, 0.02), 0, 1): one-sided — values never exceed 1, hug 1."""
    x = np.zeros((64, 64, 1), np.float32)
    key = jax.random.key(0)
    from tactile_gan_tpu.losses.gan_loss import real_target
    t = np.asarray(real_target(x.shape, label_smoothing=True, key=key))
    assert t.max() <= 1.0
    assert t.min() > 0.8
    assert abs(t.mean() - 0.992) < 0.005  # E[min(N(1,.02),1)] = 1 - .02/sqrt(2pi)
    # Fresh noise per key (reference cached it — quirk 3, deliberately fixed).
    t2 = np.asarray(real_target(x.shape, label_smoothing=True,
                                key=jax.random.key(1)))
    assert not np.allclose(t, t2)


def test_invalid_mode_rejected():
    with pytest.raises(ValueError):
        gan_loss(jnp.zeros((1, 1)), True, mode="relativistic")


# ---------------------------------------------------------------------------
# pan_loss vs reference util.pan_loss (pure torch, CPU-safe).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode,loss_type", [("normal", "l1"), ("normal", "l2"),
                                            ("gram", "l1")])
def test_pan_loss_matches_reference(reference_available, mode, loss_type):
    if not reference_available:
        pytest.skip("reference checkout unavailable")
    from torch_ref import import_ref_util
    ref_util = import_ref_util()

    feats_r = [RNG.normal(size=(2, 4, 6, 6)).astype(np.float32) for _ in range(4)]
    feats_f = [RNG.normal(size=(2, 4, 6, 6)).astype(np.float32) for _ in range(4)]
    weights = [0.0, 0.1, 0.3, 0.6]
    theirs = float(ref_util.pan_loss(
        [torch.tensor(f) for f in feats_r], [torch.tensor(f) for f in feats_f],
        mode=mode, loss_type=loss_type, weights=weights))
    # Ours takes NHWC features.
    ours = float(pan_loss(
        [jnp.array(f.transpose(0, 2, 3, 1)) for f in feats_r],
        [jnp.array(f.transpose(0, 2, 3, 1)) for f in feats_f],
        mode=mode, loss_type=loss_type, weights=weights))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_pan_loss_validation():
    f = [jnp.zeros((1, 2, 2, 2))] * 4
    with pytest.raises(ValueError):
        pan_loss(f, f, mode="style")
    with pytest.raises(ValueError):
        pan_loss(f, f, loss_type="huber")
    with pytest.raises(ValueError):
        pan_loss(f, f, weights=[1, 2, 3])


# ---------------------------------------------------------------------------
# Gradient penalty vs reference (second-order autodiff parity).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("gp_type", ["real", "fake"])
def test_gradient_penalty_matches_reference_deterministic(reference_available,
                                                          gp_type):
    """The 'real'/'fake' interpolation types have no RNG, so the penalty value
    must match the reference exactly with tied D weights — this exercises the
    full disc-forward + inner-grad path."""
    if not reference_available:
        pytest.skip("reference checkout unavailable")
    from torch_ref import import_ref_util
    ref_util = import_ref_util()
    from discriminators.PatchDiscriminator import PatchDiscriminator as RefD

    ref_d = RefD(3, 3, num_filter=4, return_filters=False, activation=False)
    randomize_(ref_d, seed=2)
    ref_d.eval()

    a = RNG.normal(size=(2, 3, 64, 64)).astype(np.float32)
    real_b = RNG.normal(size=(2, 3, 64, 64)).astype(np.float32)
    fake_b = RNG.normal(size=(2, 3, 64, 64)).astype(np.float32)

    theirs = float(ref_util.gradient_penalty(
        ref_d, torch.tensor(a), torch.tensor(real_b), torch.tensor(fake_b),
        torch.device("cpu"), ver=2, type=gp_type, lambda_gp=0.3))

    ours_d = PatchDiscriminator(nf=4, activation=False)
    params = {"params": patchdisc_params(ref_d)}

    def disc_fn(img, mask):
        logits, _ = ours_d.apply(params, img, mask)
        return logits

    nhwc = lambda x: jnp.array(x.transpose(0, 2, 3, 1))
    ours = float(gradient_penalty(
        disc_fn, nhwc(a), nhwc(real_b), nhwc(fake_b), jax.random.key(0),
        version=2, gp_type=gp_type, lambda_gp=0.3))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3)


def test_gradient_penalty_mixed_version_ranges():
    """Version 2 draws alpha from U[0.5,1] (/root/reference/util.py:79-81).
    With real==fake the penalty is alpha-independent; check it is finite and
    differentiable wrt nothing unexpected."""
    def disc_fn(img, mask):
        return jnp.sum(mask * 2.0, axis=(1, 2, 3), keepdims=True)[:, :, :, 0:1]

    x = jnp.ones((2, 4, 4, 3))
    for ver in (1, 2):
        gp = gradient_penalty(disc_fn, x, x, x, jax.random.key(1), version=ver,
                              lambda_gp=1.0)
        # d/dinterp sum(2*interp) = 2 everywhere; ||g||=2*sqrt(48)
        expected = (2 * np.sqrt(48) - 1) ** 2
        np.testing.assert_allclose(float(gp), expected, rtol=1e-5)


def test_gradient_penalty_second_order_through_params():
    """The penalty must be differentiable wrt discriminator params (the
    reference relies on create_graph=True, /root/reference/util.py:88-91)."""
    d = PatchDiscriminator(nf=4, activation=False)
    a = jnp.array(RNG.normal(size=(1, 32, 32, 3)).astype(np.float32))
    b = jnp.array(RNG.normal(size=(1, 32, 32, 3)).astype(np.float32))
    params = d.init(jax.random.key(0), a, b)

    def loss_fn(p):
        def disc_fn(img, mask):
            return d.apply(p, img, mask)[0]
        return gradient_penalty(disc_fn, a, b, b * 0.5, jax.random.key(2),
                                version=2, lambda_gp=0.1)

    grads = jax.grad(loss_fn)(params)
    norms = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(norms))
    assert sum(norms) > 0.0


# ---------------------------------------------------------------------------
# VGG perceptual (fallback-weights smoke; golden parity needs local weights).
# ---------------------------------------------------------------------------

def test_vgg_tower_shapes_and_loss():
    params = load_vgg_features("")
    x = jnp.array(RNG.normal(size=(1, 64, 64, 3)).astype(np.float32))
    feats = vgg_features_apply(params, x)
    assert [f.shape[-1] for f in feats] == [64, 128, 256, 512]
    assert [f.shape[1] for f in feats] == [64, 32, 16, 8]

    img = jnp.array(RNG.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    same = vgg_perceptual_loss(vgg_features_apply, params, img, img,
                               weights=(0, 0.1, 0.3, 0.6), resize=True)
    assert float(same) == 0.0
    other = vgg_perceptual_loss(vgg_features_apply, params, img, img * 0.5,
                                weights=(0, 0.1, 0.3, 0.6), resize=True)
    assert float(other) > 0.0


def test_l1_loss():
    a = jnp.ones((2, 2)) * 3
    b = jnp.ones((2, 2))
    assert float(l1_loss(a, b)) == 2.0


# ---------------------------------------------------------------------------
# VGG .npz loading + block parity vs a torch stack built with the reference's
# slicing (/root/reference/util.py:104-107): proves the OIHW->HWIO transpose
# and the [:4],[4:9],[9:16],[16:23] block boundaries with synthetic weights.
# ---------------------------------------------------------------------------

# torchvision VGG16 `features` conv layout: (index, in_ch, out_ch); indices
# 4/9/16 are MaxPool2d(2), every other non-conv index is ReLU.
_VGG_CONVS = ((0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
              (10, 128, 256), (12, 256, 256), (14, 256, 256),
              (17, 256, 512), (19, 512, 512), (21, 512, 512))


def _synth_vgg_npz(tmp_path):
    """A torchvision-state-dict-format .npz with deterministic weights."""
    rng = np.random.default_rng(7)
    arrs = {}
    for idx, cin, cout in _VGG_CONVS:
        arrs[f"features.{idx}.weight"] = rng.normal(
            scale=0.05, size=(cout, cin, 3, 3)).astype(np.float32)
        arrs[f"features.{idx}.bias"] = rng.normal(
            scale=0.05, size=(cout,)).astype(np.float32)
    path = tmp_path / "vgg16_synth.npz"
    np.savez(path, **arrs)
    return str(path), arrs


def _torch_vgg_blocks(arrs):
    """The nn.Sequential the reference slices out of torchvision VGG16."""
    import torch.nn as nn
    conv_specs = {idx: (cin, cout) for idx, cin, cout in _VGG_CONVS}
    layers = []
    for i in range(23):
        if i in conv_specs:
            cin, cout = conv_specs[i]
            conv = nn.Conv2d(cin, cout, 3, padding=1)
            with torch.no_grad():
                conv.weight.copy_(torch.tensor(arrs[f"features.{i}.weight"]))
                conv.bias.copy_(torch.tensor(arrs[f"features.{i}.bias"]))
            layers.append(conv)
        elif i in (4, 9, 16):
            layers.append(nn.MaxPool2d(2))
        else:
            layers.append(nn.ReLU(inplace=False))
    seq = nn.Sequential(*layers).eval()
    return [seq[:4], seq[4:9], seq[9:16], seq[16:23]]


def test_vgg_npz_load_and_block_parity(tmp_path):
    path, arrs = _synth_vgg_npz(tmp_path)
    params = load_vgg_features(path)
    x = RNG.normal(size=(2, 32, 32, 3)).astype(np.float32)

    ours = vgg_features_apply(params, jnp.asarray(x))

    t = torch.tensor(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        theirs = []
        for block in _torch_vgg_blocks(arrs):
            t = block(t)
            theirs.append(t.numpy().transpose(0, 2, 3, 1))

    assert len(ours) == 4
    for got, want in zip(ours, theirs):
        assert got.shape == want.shape
        # atol scaled to the block's activation magnitude: near-zero ReLU
        # outputs differ by float-reassociation noise between XLA and torch.
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                                   atol=1e-4 * float(np.abs(want).max()))


def test_vgg_perceptual_loss_golden_vs_reference_math(tmp_path):
    """Full v1 loss (normalize -> bilinear 224 -> 4-block weighted L1) vs the
    reference's VGGPerceptualLoss.forward math (/root/reference/util.py:119-144)
    executed with torch on the same synthetic weights."""
    path, arrs = _synth_vgg_npz(tmp_path)
    params = load_vgg_features(path)
    w_per = (0.0, 0.1, 0.3, 0.6)

    rng = np.random.default_rng(3)
    # The reference feeds [-1,1] source-domain fakes and [0,1] targets.
    fake = rng.uniform(-1, 1, size=(1, 64, 64, 3)).astype(np.float32)
    real = rng.uniform(0, 1, size=(1, 64, 64, 3)).astype(np.float32)

    got = float(vgg_perceptual_loss(vgg_features_apply, params,
                                    jnp.asarray(real), jnp.asarray(fake),
                                    weights=w_per, resize=True))

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = (torch.tensor(real.transpose(0, 3, 1, 2)) - mean) / std
    y = (torch.tensor(fake.transpose(0, 3, 1, 2)) - mean) / std
    x = tF.interpolate(x, size=(224, 224), mode="bilinear", align_corners=False)
    y = tF.interpolate(y, size=(224, 224), mode="bilinear", align_corners=False)
    want = 0.0
    with torch.no_grad():
        for i, block in enumerate(_torch_vgg_blocks(arrs)):
            x, y = block(x), block(y)
            want += float(tF.l1_loss(x, y)) * w_per[i]

    np.testing.assert_allclose(got, want, rtol=5e-4)


def test_vgg_weights_env_var_resolution(tmp_path, monkeypatch):
    from tactile_gan_tpu.models.vgg import ENV_WEIGHTS, resolve_weights_path
    path, _ = _synth_vgg_npz(tmp_path)
    assert resolve_weights_path("") == ""
    assert resolve_weights_path(path) == path
    assert resolve_weights_path("/nonexistent.npz") == ""
    monkeypatch.setenv(ENV_WEIGHTS, path)
    assert resolve_weights_path("") == path
