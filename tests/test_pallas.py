"""Pallas fused instance-norm kernel tests (interpret mode on CPU; the same
kernel compiles via Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tactile_gan_tpu.ops.norm import instance_norm
from tactile_gan_tpu.ops.pallas.instance_norm import instance_norm_act

RNG = np.random.default_rng(17)


def _ref(x, scale, offset, act):
    y = instance_norm(x, scale, offset)
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "leaky_relu":
        y = jax.nn.leaky_relu(y, negative_slope=0.2)
    return y


@pytest.mark.parametrize("shape", [(2, 8, 8, 16), (1, 16, 16, 64), (2, 32, 8, 128)])
@pytest.mark.parametrize("act", [None, "relu", "leaky_relu"])
def test_fused_kernel_matches_xla(shape, act):
    x = jnp.array(RNG.normal(size=shape).astype(np.float32) * 3 + 1)
    c = shape[-1]
    scale = jnp.array(RNG.normal(size=(c,)).astype(np.float32))
    offset = jnp.array(RNG.normal(size=(c,)).astype(np.float32))
    got = instance_norm_act(x, scale, offset, act=act)
    want = _ref(x, scale, offset, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_kernel_non_affine():
    x = jnp.array(RNG.normal(size=(2, 8, 8, 32)).astype(np.float32))
    got = instance_norm_act(x, None, None, act="relu")
    want = _ref(x, None, None, "relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_kernel_bf16_io():
    x32 = RNG.normal(size=(1, 16, 16, 32)).astype(np.float32)
    x = jnp.array(x32, jnp.bfloat16)
    scale = jnp.ones((32,), jnp.float32)
    offset = jnp.zeros((32,), jnp.float32)
    got = instance_norm_act(x, scale, offset, act="relu")
    assert got.dtype == jnp.bfloat16
    want = _ref(jnp.array(x32), scale, offset, "relu")
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=0.1)


def test_fused_kernel_fallback_non_pow2(caplog):
    """Discriminator shapes (63x63 etc.) are not power-of-two; must route to
    the XLA path transparently — and say so once per process."""
    import logging

    import tactile_gan_tpu.ops.pallas.instance_norm as in_mod
    in_mod._fallback_logged = False  # earlier tests may have tripped it

    x = jnp.array(RNG.normal(size=(1, 63, 63, 8)).astype(np.float32))
    scale = jnp.ones((8,), jnp.float32)
    offset = jnp.zeros((8,), jnp.float32)
    big = jnp.array(RNG.normal(size=(1, 144, 144, 8)).astype(np.float32))
    with caplog.at_level(logging.WARNING,
                         logger="tactile_gan_tpu.ops.pallas.instance_norm"):
        got = instance_norm_act(x, scale, offset, act="leaky_relu")
        # Discriminator-scale non-pow2 shapes are silent by design...
        assert not caplog.records
        # ...generator-scale ones warn, once per process.
        instance_norm_act(big, scale, offset, act="relu")
        again = instance_norm_act(big, scale, offset, act="relu")
    want = _ref(x, scale, offset, "leaky_relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(again), np.asarray(_ref(big, scale, offset, "relu")),
        atol=2e-5)
    hits = [r for r in caplog.records if "not a power of two" in r.message]
    assert len(hits) == 1  # logged once, not per call


def test_fused_kernel_bf16_gradients_match_xla():
    """Round 4: bf16 kernel I/O with f32 VMEM statistics — the backward
    kernel runs on the bf16 row views too. Gradients must match the f32 XLA
    reference within bf16 rounding of the activations."""
    x32 = RNG.normal(size=(2, 8, 8, 16)).astype(np.float32)
    x = jnp.array(x32, jnp.bfloat16)
    scale = jnp.array(RNG.normal(size=(16,)).astype(np.float32))
    offset = jnp.array(RNG.normal(size=(16,)).astype(np.float32))

    def loss_pallas(x, s, o):
        y = instance_norm_act(x, s, o, act="relu")
        assert y.dtype == jnp.bfloat16
        return jnp.sum(jnp.square(y.astype(jnp.float32)))

    def loss_xla(x32, s, o):
        return jnp.sum(jnp.square(_ref(x32, s, o, "relu")))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, offset)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(jnp.array(x32), scale, offset)
    assert g1[0].dtype == jnp.bfloat16
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b), atol=0.15, rtol=0.05)


def test_apply_norm_act_keeps_bf16_resident():
    """blocks.apply_norm_act no longer upcasts bf16 inputs before the fused
    kernel (deep-row bf16 residency composes with the Pallas-norm path)."""
    from tactile_gan_tpu.models.blocks import apply_norm_act

    x = jnp.array(RNG.normal(size=(1, 8, 8, 16)).astype(np.float32),
                  jnp.bfloat16)
    scale = jnp.ones((16,), jnp.float32)
    offset = jnp.zeros((16,), jnp.float32)
    y = apply_norm_act(x, scale, offset, "relu", use_pallas=True)
    assert y.dtype == jnp.bfloat16


def test_fused_kernel_gradients_match_xla():
    x = jnp.array(RNG.normal(size=(2, 8, 8, 16)).astype(np.float32))
    scale = jnp.array(RNG.normal(size=(16,)).astype(np.float32))
    offset = jnp.array(RNG.normal(size=(16,)).astype(np.float32))

    def loss_pallas(x, s, o):
        return jnp.sum(jnp.square(instance_norm_act(x, s, o, act="relu")))

    def loss_xla(x, s, o):
        return jnp.sum(jnp.square(_ref(x, s, o, "relu")))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, offset)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(x, scale, offset)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_model_with_pallas_matches_without():
    """A whole generator forward with use_pallas=True equals the XLA path."""
    from tactile_gan_tpu.models import UNetPlusPlus

    x = jnp.array(RNG.normal(size=(1, 32, 32, 3)).astype(np.float32))
    m_ref = UNetPlusPlus(output_dim=3, nf=4, use_pallas=False)
    m_pal = UNetPlusPlus(output_dim=3, nf=4, use_pallas=True)
    params = m_ref.init(jax.random.key(0), x)
    a = m_ref.apply(params, x)
    b = m_pal.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_kernel_lane_fold_engages_and_edge_cases():
    """C<128 inputs take the lane-folded layout (free reshape to 128 lanes);
    shapes where H*W doesn't divide by the fold factor fall back to the
    unfolded kernel — both must match XLA."""
    from tactile_gan_tpu.ops.pallas import instance_norm as mod

    # hw=4 < f=8 for c=16: fold precondition fails, unfolded kernel path.
    x = jnp.array(RNG.normal(size=(2, 2, 2, 16)).astype(np.float32))
    s = jnp.array(RNG.normal(size=(16,)).astype(np.float32))
    o = jnp.array(RNG.normal(size=(16,)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(instance_norm_act(x, s, o, act="relu")),
        np.asarray(_ref(x, s, o, "relu")), atol=2e-5)

    # c=8 -> f=16 (the deepest fold used by nf=8 test models).
    x = jnp.array(RNG.normal(size=(1, 16, 16, 8)).astype(np.float32) * 2 - 1)
    s8 = jnp.array(RNG.normal(size=(8,)).astype(np.float32))
    o8 = jnp.array(RNG.normal(size=(8,)).astype(np.float32))
    got = instance_norm_act(x, s8, o8, act="leaky_relu")
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_ref(x, s8, o8, "leaky_relu")),
                               atol=2e-5)

    # Gradient parity through the folded path (c=64 — the production row-0
    # width at nf=64).
    x = jnp.array(RNG.normal(size=(1, 8, 8, 64)).astype(np.float32))
    s64 = jnp.array(RNG.normal(size=(64,)).astype(np.float32))
    o64 = jnp.array(RNG.normal(size=(64,)).astype(np.float32))
    g1 = jax.grad(lambda a: jnp.sum(
        instance_norm_act(a, s64, o64, act="relu") ** 2))(x)
    g2 = jax.grad(lambda a: jnp.sum(_ref(a, s64, o64, "relu") ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-4)


def test_batch_lane_and_per_batch_forms_match_xla():
    """Both kernel layouts against the XLA reference: batch-lane (N*C fills
    or folds into 128-lane tiles — the production form; lane index is
    n*C + c so the affine must tile correctly over n) and the per-batch
    fallback (N*C with no tile relation to 128, e.g. N=3 C=64)."""
    for n, c in ((4, 64), (16, 8), (3, 64), (2, 64)):
        x = jnp.array(RNG.normal(size=(n, 8, 8, c)).astype(np.float32))
        s = jnp.array(RNG.normal(size=(c,)).astype(np.float32))
        o = jnp.array(RNG.normal(size=(c,)).astype(np.float32))
        got = instance_norm_act(x, s, o, act="leaky_relu")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(_ref(x, s, o, "leaky_relu")),
            atol=2e-5, err_msg=f"n={n} c={c}")
        g1 = jax.grad(lambda a: jnp.sum(
            instance_norm_act(a, s, o, act="relu") ** 2))(x)
        g2 = jax.grad(lambda a: jnp.sum(_ref(a, s, o, "relu") ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=5e-4, err_msg=f"n={n} c={c}")
