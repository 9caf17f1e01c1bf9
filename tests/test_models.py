"""Model tests: output shapes, init statistics, and fixed-weight forward
parity against the PyTorch reference (SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from tactile_gan_tpu.models import (
    BCDUNet, PatchDiscriminator, UNet, UNetPlusPlus,
    create_discriminator, create_generator,
)

from torch_ref import (
    bcdunet_params, patchdisc_params, randomize_, unet_params, unetpp_params,
)

RNG = np.random.default_rng(3)


def _nhwc(x):
    return x.transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# Shapes & factory.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["UNet", "UNet++", "BCDUNet", "unet", "bcdUNet"])
def test_factory_and_shapes(name):
    model = create_generator(name, output_dim=3, nf=8, activation=True)
    # UNet requires >=256px (7 stride-2 stages, matching the reference's
    # effective minimum); the others accept smaller inputs.
    size = 256 if name.lower() == "unet" else 128
    x = jnp.zeros((1, size, size, 3))
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, size, size, 3)
    assert np.asarray(jnp.abs(y)).max() <= 1.0  # tanh head


def test_factory_rejects_unknown():
    with pytest.raises(NameError):
        create_generator("resnet")
    with pytest.raises(NameError):
        create_discriminator("multiscale")


def test_patch_discriminator_receptive_field_256():
    """The valid-padding stack maps 256^2 -> 57^2 patches
    (/root/reference/discriminators/PatchDiscriminator.py:22-28;
    SURVEY.md C8: 127→63→61→59→57)."""
    d = PatchDiscriminator(nf=4, activation=True)
    a = jnp.zeros((1, 256, 256, 3))
    params = d.init(jax.random.key(0), a, a)
    logits, feats = d.apply(params, a, a)
    assert logits.shape == (1, 57, 57, 1)
    assert [f.shape[1] for f in feats] == [127, 63, 61, 59]
    assert len(feats) == 4


def test_init_statistics():
    """Conv kernels ~ N(0, 0.02), norms at (1, 0), biases zero — matching
    /root/reference/util.py:23-34 + torch InstanceNorm defaults."""
    model = UNet(output_dim=3, nf=16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)))["params"]
    kernels = [np.asarray(v) for v in jax.tree.leaves(params) if v.ndim == 4]
    big = np.concatenate([k.ravel() for k in kernels])
    assert abs(big.std() - 0.02) < 0.002
    assert abs(big.mean()) < 0.001
    norm_scales = np.asarray(params["down1"]["down"]["norm"]["scale"])
    np.testing.assert_array_equal(norm_scales, np.ones_like(norm_scales))


# ---------------------------------------------------------------------------
# Forward parity vs the PyTorch reference, fixed weights.
# ---------------------------------------------------------------------------

def _parity_case(torch_model, flax_model, to_params, x_nchw, atol):
    randomize_(torch_model, seed=11)
    torch_model.eval()
    with torch.no_grad():
        theirs = torch_model(torch.tensor(x_nchw)).numpy()
    params = {"params": to_params(torch_model)}
    ours = flax_model.apply(params, jnp.array(_nhwc(x_nchw)))
    np.testing.assert_allclose(
        np.asarray(ours), _nhwc(theirs), atol=atol,
        err_msg=f"{type(torch_model).__name__} parity failed")


def test_unet_forward_parity(reference_available):
    if not reference_available:
        pytest.skip("reference checkout unavailable")
    from generators.UNet import UNet as RefUNet
    x = RNG.normal(size=(1, 3, 256, 256)).astype(np.float32)
    _parity_case(RefUNet(3, 3, 8, activation=True),
                 UNet(output_dim=3, nf=8, activation=True),
                 unet_params, x, atol=2e-4)


def test_unetpp_forward_parity(reference_available):
    if not reference_available:
        pytest.skip("reference checkout unavailable")
    from generators.UNet_plusplus import UNet_plusplus as RefUNetPP
    x = RNG.normal(size=(1, 3, 64, 64)).astype(np.float32)
    _parity_case(RefUNetPP(3, 3, 8, activation=True),
                 UNetPlusPlus(output_dim=3, nf=8, activation=True),
                 unetpp_params, x, atol=2e-4)


def test_bcdunet_forward_parity(reference_available):
    if not reference_available:
        pytest.skip("reference checkout unavailable")
    from generators.BCDUNet import BCDUNet as RefBCDUNet
    x = RNG.normal(size=(1, 3, 64, 64)).astype(np.float32)
    ref = RefBCDUNet(3, 3, 8, frame_size=(64, 64), bidirectional=True,
                     activation=True)
    _parity_case(ref, BCDUNet(output_dim=3, nf=8, activation=True),
                 bcdunet_params, x, atol=2e-4)


@pytest.mark.parametrize("sigmoid", [True, False])
def test_patch_discriminator_forward_parity(reference_available, sigmoid):
    if not reference_available:
        pytest.skip("reference checkout unavailable")
    from discriminators.PatchDiscriminator import PatchDiscriminator as RefD
    a = RNG.normal(size=(2, 3, 128, 128)).astype(np.float32)
    b = RNG.normal(size=(2, 3, 128, 128)).astype(np.float32)
    ref = RefD(3, 3, num_filter=8, return_filters=True, activation=sigmoid)
    randomize_(ref, seed=5)
    ref.eval()
    with torch.no_grad():
        theirs = ref(torch.tensor(a), torch.tensor(b)).numpy()
        ref_feats = [f.numpy() for f in ref.get_intermediate_output()]

    ours_model = PatchDiscriminator(nf=8, activation=sigmoid)
    params = {"params": patchdisc_params(ref)}
    logits, feats = ours_model.apply(params, jnp.array(_nhwc(a)), jnp.array(_nhwc(b)))
    np.testing.assert_allclose(np.asarray(logits), _nhwc(theirs), atol=2e-4)
    assert len(feats) == len(ref_feats) == 4
    for ours_f, theirs_f in zip(feats, ref_feats):
        np.testing.assert_allclose(np.asarray(ours_f), _nhwc(theirs_f), atol=2e-4)


# ---------------------------------------------------------------------------
# Space-to-depth UNet++ variant (--space_to_depth, TPU perf flag).
# ---------------------------------------------------------------------------

def test_space_to_depth_roundtrip_and_pool_semantics():
    from tactile_gan_tpu.ops.pool import avg_pool2
    from tactile_gan_tpu.ops.resize import depth_to_space2, space_to_depth2

    x = jnp.asarray(RNG.normal(size=(2, 8, 8, 6)).astype(np.float32))
    folded = space_to_depth2(x)
    assert folded.shape == (2, 4, 4, 24)
    np.testing.assert_array_equal(np.asarray(depth_to_space2(folded)),
                                  np.asarray(x))
    # The model's folded "pool_row0" (mean over the four 2x2-position channel
    # groups) must equal a true logical avg_pool2.
    gm = folded.reshape(2, 4, 4, 4, 6).mean(axis=3)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(avg_pool2(x)),
                               rtol=1e-6)


def test_unetpp_space_to_depth_variant_forward():
    from tactile_gan_tpu.models.unet_plusplus import UNetPlusPlus

    model = UNetPlusPlus(output_dim=3, nf=8, activation=True,
                         space_to_depth=True)
    x = jnp.asarray(RNG.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(y)).all()
    # Row-0 nodes live in folded space at width 2*nf.
    k = params["params"]["node0_0"]["a"]["conv"]["kernel"]
    assert k.shape == (3, 3, 12, 16)  # s2d input: 4*3 channels; width 2*nf

    # Gradients flow end to end through fold/unfold.
    g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_space_to_depth_rejected_outside_unetpp():
    with pytest.raises(ValueError, match="only supported for UNet"):
        create_generator("UNet", space_to_depth=True)
    with pytest.raises(ValueError, match="even nf"):
        from tactile_gan_tpu.models.unet_plusplus import UNetPlusPlus
        UNetPlusPlus(output_dim=3, nf=5, space_to_depth=True).init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 3)))


# ---------------------------------------------------------------------------
# Concat-free nested-node convs (--split_concat, on by default).
# ---------------------------------------------------------------------------

def test_unetpp_split_concat_matches_concat():
    """conv2d_multi over the input list is the SAME network as conv of the
    concat: identical parameter tree, outputs/gradients equal to FP noise —
    so checkpoints are interchangeable between the two modes."""
    from tactile_gan_tpu.models.unet_plusplus import UNetPlusPlus

    x = jnp.asarray(RNG.normal(size=(1, 32, 32, 3)).astype(np.float32))
    m_cat = UNetPlusPlus(output_dim=3, nf=8, split_concat=False)
    m_split = UNetPlusPlus(output_dim=3, nf=8, split_concat=True)
    params = m_cat.init(jax.random.key(0), x)
    assert (jax.tree.map(lambda a: a.shape, params)
            == jax.tree.map(lambda a: a.shape,
                            m_split.init(jax.random.key(0), x)))
    np.testing.assert_allclose(np.asarray(m_cat.apply(params, x)),
                               np.asarray(m_split.apply(params, x)),
                               atol=1e-5)
    g1 = jax.grad(lambda p: jnp.sum(m_cat.apply(p, x) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(m_split.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_conv2d_multi_channel_mismatch_raises():
    from tactile_gan_tpu.ops.conv import conv2d_multi

    k = jnp.zeros((3, 3, 8, 4), jnp.float32)
    xs = [jnp.zeros((1, 4, 4, 3)), jnp.zeros((1, 4, 4, 3))]
    with pytest.raises(ValueError, match="kernel input width"):
        conv2d_multi(xs, k, padding=1)
    # Over-wide inputs must hit the same clear ValueError, not an opaque
    # lax.slice_in_dim out-of-bounds (validated before slicing).
    xs_wide = [jnp.zeros((1, 4, 4, 6)), jnp.zeros((1, 4, 4, 6))]
    with pytest.raises(ValueError, match="kernel input width"):
        conv2d_multi(xs_wide, k, padding=1)


def test_conv_accepts_bare_up2_marker():
    """A bare Up2 passed to Conv must mean 'one lazily-upsampled part', not
    fall into the NamedTuple-is-a-tuple branch (which would silently convolve
    the coarse tensor at half resolution)."""
    from tactile_gan_tpu.models.blocks import Conv
    from tactile_gan_tpu.ops.resize import Up2, upsample_nearest2

    x = jnp.asarray(RNG.normal(size=(1, 8, 8, 6)).astype(np.float32))
    m = Conv(features=4, kernel_size=3, padding=1)
    params = m.init(jax.random.key(0), [Up2(x)])
    want = m.apply(params, [Up2(x)])
    got = m.apply(params, Up2(x))
    assert got.shape == (1, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # And it equals the materialized composition.
    dense = m.apply(params, upsample_nearest2(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense), atol=1e-5)


def test_lane_pack_exact_equality():
    """The w-packed convs (lane_pack) are the SAME network: outputs equal the
    plain form to fp-noise with identical parameters, for plain convs,
    multi-piece convs with lazy Up2 parts, and the full UNet++."""
    from tactile_gan_tpu.models.factory import create_generator
    from tactile_gan_tpu.ops.conv import conv2d, conv2d_multi
    from tactile_gan_tpu.ops.resize import Up2

    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 5)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 5, 7)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(7,)).astype(np.float32))
    a0 = conv2d(x, k, stride=1, padding=1, bias=b)
    a1 = conv2d(x, k, stride=1, padding=1, bias=b, lane_pack=True)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), atol=1e-5)

    xs = [x, Up2(jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32)))]
    k2 = jnp.asarray(rng.normal(size=(3, 3, 8, 6)).astype(np.float32))
    m0 = conv2d_multi(xs, k2, stride=1, padding=1)
    m1 = conv2d_multi(xs, k2, stride=1, padding=1, lane_pack=True)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), atol=1e-5)

    # Full model: identical params, identical output.
    gen0 = create_generator("UNet++", output_dim=3, nf=4, activation=True)
    gen1 = create_generator("UNet++", output_dim=3, nf=4, activation=True,
                            lane_pack=True)
    xin = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    params = gen0.init(jax.random.key(0), xin)
    y0 = gen0.apply(params, xin)
    y1 = gen1.apply(params, xin)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)

    # Gradients agree too (the packed kernel embedding is differentiable).
    g0 = jax.grad(lambda p: jnp.sum(gen0.apply(p, xin) ** 2))(params)
    g1 = jax.grad(lambda p: jnp.sum(gen1.apply(p, xin) ** 2))(params)
    for l0, l1 in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=3e-4)


def test_packed_row0_exact_equality():
    """The packed-resident row 0 (--packed_row0) is the SAME network: outputs
    and parameter gradients match the plain form with identical parameters
    to fp-noise (the packed conv/norm are exact reformulations, not a
    variant — unlike --space_to_depth)."""
    from tactile_gan_tpu.models.factory import create_generator

    rng = np.random.default_rng(47)
    gen0 = create_generator("UNet++", output_dim=3, nf=4, activation=True)
    gen1 = create_generator("UNet++", output_dim=3, nf=4, activation=True,
                            packed_row0=True)
    xin = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    params = gen0.init(jax.random.key(0), xin)
    y0 = gen0.apply(params, xin)
    y1 = gen1.apply(params, xin)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)

    def worst(ga, gb):
        w = 0.0
        for l0, l1 in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            l0, l1 = np.asarray(l0), np.asarray(l1)
            w = max(w, float(np.abs(l0 - l1).max()
                             / (np.abs(l0).max() + 1e-8)))
        return w

    loss0 = lambda p: jnp.sum(gen0.apply(p, xin) ** 2)
    g0 = jax.grad(loss0)(params)
    g1 = jax.grad(lambda p: jnp.sum(gen1.apply(p, xin) ** 2))(params)
    # The tiny nf=4 net is gradient-ill-conditioned: ReLU boundary flips
    # turn fp-noise-level forward differences into percent-level drift on
    # some leaves (measured: a 1e-6 relative param perturbation moves the
    # worst leaf by the same amount). Calibrate the bound against that
    # intrinsic sensitivity instead of a fixed tolerance.
    pert = jax.tree.map(
        lambda l: l * (1 + 1e-6 * np.random.default_rng(1)
                       .standard_normal(l.shape).astype(np.float32)),
        params)
    sens = worst(g0, jax.grad(loss0)(pert))
    assert worst(g0, g1) < max(1e-4, 3 * sens)


def test_bf16_resident_close_to_plain_bf16():
    """--bf16_resident keeps deep-row activations bf16 between ops: outputs
    stay within bf16 rounding of the plain bf16-compute model (which
    upcasts to f32 between ops), and gradients stay finite."""
    from tactile_gan_tpu.models.factory import create_generator

    rng = np.random.default_rng(13)
    xin = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    g0 = create_generator("UNet++", 3, 8, True, compute_dtype=jnp.bfloat16)
    g1 = create_generator("UNet++", 3, 8, True, compute_dtype=jnp.bfloat16,
                          bf16_resident=True)
    params = g0.init(jax.random.key(0), xin)
    y0 = g0.apply(params, xin)
    y1 = g1.apply(params, xin)
    assert y1.dtype == jnp.float32  # the head always emits f32
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=0.05)
    g = jax.grad(lambda p: jnp.mean((g1.apply(p, xin) - 0.5) ** 2))(params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))
