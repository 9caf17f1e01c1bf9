"""Unit tests for the ops layer: conv geometry, instance norm, pooling,
resize — including goldens against torch (CPU) where the reference relied on
the corresponding nn layers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from tactile_gan_tpu.ops import (
    avg_pool2, conv2d, conv2d_transpose, instance_norm, max_pool2,
    resize_bilinear, upsample_nearest2,
)

RNG = np.random.default_rng(7)


def _nhwc(x_nchw):
    return x_nchw.transpose(0, 2, 3, 1)


def test_conv2d_matches_torch_k4s2p1():
    x = RNG.normal(size=(2, 5, 16, 16)).astype(np.float32)
    k = RNG.normal(size=(4, 4, 5, 7)).astype(np.float32)
    b = RNG.normal(size=(7,)).astype(np.float32)
    ours = conv2d(jnp.array(_nhwc(x)), jnp.array(k), stride=2, padding=1,
                  bias=jnp.array(b))
    layer = tnn.Conv2d(5, 7, 4, 2, 1)
    layer.weight.data = torch.tensor(k.transpose(3, 2, 0, 1))
    layer.bias.data = torch.tensor(b)
    theirs = _nhwc(layer(torch.tensor(x)).detach().numpy())
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


def test_conv2d_matches_torch_k3s1p0():
    # PatchDiscriminator geometry: valid padding.
    x = RNG.normal(size=(1, 6, 20, 20)).astype(np.float32)
    k = RNG.normal(size=(3, 3, 6, 4)).astype(np.float32)
    ours = conv2d(jnp.array(_nhwc(x)), jnp.array(k), stride=1, padding=0)
    layer = tnn.Conv2d(6, 4, 3, 1, 0, bias=False)
    layer.weight.data = torch.tensor(k.transpose(3, 2, 0, 1))
    theirs = _nhwc(layer(torch.tensor(x)).detach().numpy())
    assert ours.shape == theirs.shape == (1, 18, 18, 4)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


@pytest.mark.parametrize("kernel,stride,padding", [(4, 2, 1), (2, 2, 0)])
def test_conv2d_transpose_matches_torch(kernel, stride, padding):
    x = RNG.normal(size=(2, 5, 16, 16)).astype(np.float32)
    k = RNG.normal(size=(kernel, kernel, 5, 7)).astype(np.float32)
    b = RNG.normal(size=(7,)).astype(np.float32)
    ours = conv2d_transpose(jnp.array(_nhwc(x)), jnp.array(k), stride=stride,
                            padding=padding, bias=jnp.array(b))
    layer = tnn.ConvTranspose2d(5, 7, kernel, stride, padding)
    layer.weight.data = torch.tensor(k.transpose(2, 3, 0, 1))
    layer.bias.data = torch.tensor(b)
    theirs = _nhwc(layer(torch.tensor(x)).detach().numpy())
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


@pytest.mark.parametrize("affine", [True, False])
def test_instance_norm_matches_torch(affine):
    x = RNG.normal(size=(3, 5, 8, 8)).astype(np.float32)
    scale = RNG.normal(size=(5,)).astype(np.float32) if affine else None
    offset = RNG.normal(size=(5,)).astype(np.float32) if affine else None
    ours = instance_norm(
        jnp.array(_nhwc(x)),
        None if scale is None else jnp.array(scale),
        None if offset is None else jnp.array(offset),
    )
    layer = tnn.InstanceNorm2d(5, affine=affine, track_running_stats=False)
    if affine:
        layer.weight.data = torch.tensor(scale)
        layer.bias.data = torch.tensor(offset)
    theirs = _nhwc(layer(torch.tensor(x)).detach().numpy())
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_pooling_matches_torch():
    x = RNG.normal(size=(2, 3, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(avg_pool2(jnp.array(_nhwc(x)))),
        _nhwc(tF.avg_pool2d(torch.tensor(x), 2, 2).numpy()), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(max_pool2(jnp.array(_nhwc(x)))),
        _nhwc(tF.max_pool2d(torch.tensor(x), 2, 2).numpy()), atol=1e-6)


def test_upsample_nearest_matches_torch():
    x = RNG.normal(size=(2, 3, 5, 5)).astype(np.float32)
    ours = upsample_nearest2(jnp.array(_nhwc(x)))
    theirs = _nhwc(tF.interpolate(torch.tensor(x), scale_factor=2).numpy())
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)


def test_resize_bilinear_matches_torch_align_corners_false():
    x = RNG.normal(size=(1, 3, 16, 16)).astype(np.float32)
    ours = resize_bilinear(jnp.array(_nhwc(x)), (11, 11))
    theirs = _nhwc(tF.interpolate(torch.tensor(x), size=(11, 11),
                                  mode="bilinear", align_corners=False).numpy())
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


def test_conv2d_bf16_compute_close_to_f32():
    x = RNG.normal(size=(1, 32, 32, 16)).astype(np.float32)
    k = RNG.normal(size=(3, 3, 16, 16)).astype(np.float32) * 0.05
    f32 = conv2d(jnp.array(x), jnp.array(k), padding=1)
    bf16 = conv2d(jnp.array(x), jnp.array(k), padding=1,
                  compute_dtype=jnp.bfloat16)
    # bf16 MXU compute, f32 result (measured faster than bf16-through on v5e
    # for this model's narrow channel widths — see ops/conv.py).
    assert bf16.dtype == jnp.float32
    err = np.abs(np.asarray(f32) - np.asarray(bf16, np.float32)).max()
    assert err < 0.1


def test_conv3x3_on_up2_matches_materialized_and_torch():
    """The folded 4-phase up-conv equals conv3x3(nearest-up2(x)) — checked
    against torch's Upsample+Conv2d composition, the reference's nested-node
    input pattern (/root/reference/generators/UNet_plusplus.py:40,72-84)."""
    from tactile_gan_tpu.ops.conv import _conv3x3_on_up2
    from tactile_gan_tpu.ops.resize import Up2, upsample_nearest2

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 5, 7, 6)).astype(np.float32)
    w = (rng.normal(size=(3, 3, 6, 4)) * 0.1).astype(np.float32)

    got = _conv3x3_on_up2(jnp.asarray(x), jnp.asarray(w), None)

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    tw = torch.from_numpy(w).permute(3, 2, 0, 1)
    up = tF.interpolate(tx, scale_factor=2, mode="nearest")
    want = tF.conv2d(up, tw, padding=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    # And Up2's logical shape/materialize agree.
    u = Up2(jnp.asarray(x))
    assert u.shape == (2, 10, 14, 6)
    np.testing.assert_array_equal(np.asarray(u.materialize()),
                                  np.asarray(upsample_nearest2(jnp.asarray(x))))


def test_packed_conv3x3_matches_lax_conv():
    """ops/packed_row.py: the packed conv (custom VJP: Pallas/XLA-twin fwd,
    packed dgrad, embedding-transpose wgrad) equals the plain lax conv in
    value and both gradients."""
    from jax import lax

    from tactile_gan_tpu.ops.packed_row import (
        PackedW, pack_w, packed_conv3x3, unpack_w,
    )

    rng = np.random.default_rng(7)
    for (N, H, W, C, Co) in [(2, 8, 8, 5, 6), (1, 6, 12, 64, 64)]:
        x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, C, Co)).astype(np.float32) * .1)
        dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        ref = lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)),
                                       dimension_numbers=dn)
        got = unpack_w(PackedW(packed_conv3x3(pack_w(x).d, k, H, None), H))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

        def loss_ref(x2, k2):
            return jnp.sum(jnp.sin(lax.conv_general_dilated(
                x2, k2, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)))

        def loss_packed(x2, k2):
            y = packed_conv3x3(pack_w(x2).d, k2, H, None)
            return jnp.sum(jnp.sin(unpack_w(PackedW(y, H))))

        ga = jax.grad(loss_ref, argnums=(0, 1))(x, k)
        gb = jax.grad(loss_packed, argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(ga[0]),
                                   atol=5e-5, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gb[1]), np.asarray(ga[1]),
                                   atol=5e-4, rtol=1e-3)


def test_packed_mosaic_kernel_matches_xla_twin():
    """ops/pallas/conv3x3.py: the conv3x3_packed MOSAIC kernel itself (via
    the Mosaic interpreter — the CPU suite otherwise only exercises the
    _conv_packed_xla backend branch of _packed_fwd_impl) equals the exact
    XLA twin on production row-0 lane geometry (2C = 2Co = 128). A
    kernel-side regression would otherwise surface only through end-to-end
    TPU quality runs (ADVICE r3)."""
    from tactile_gan_tpu.ops.pallas.conv3x3 import conv3x3_packed
    from tactile_gan_tpu.ops.packed_row import _conv_packed_xla, pack_w

    rng = np.random.default_rng(11)
    C = Co = 64  # the production row-0 widths (nf=64)
    for (N, H, W), dtype in [((1, 16, 16), np.float32),
                             ((2, 8, 12), np.float32),
                             ((1, 16, 16), jnp.bfloat16)]:
        x = rng.normal(size=(N, H, W, C)).astype(np.float32)
        k = rng.normal(size=(3, 3, C, Co)).astype(np.float32) * 0.1
        xp = pack_w(jnp.asarray(x).astype(dtype)).d
        kj = jnp.asarray(k)
        want = _conv_packed_xla(xp, kj, H, jnp.float32)
        got = conv3x3_packed(xp, kj, h=H, interpret=True,
                             compute_dtype=jnp.float32)
        assert got.dtype == xp.dtype  # output dtype follows the input
        tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=tol, rtol=1e-3)


def test_packed_wgrad_mosaic_kernel_matches_xla_twin():
    """ops/pallas/conv3x3.py conv3x3_packed_wgrad (Mosaic interpreter): the
    in-VMEM dB accumulation equals the materialized-view einsum twin
    (_wgrad_xla) on production lane geometry. Round 5 moved the packed
    conv's dk off the XLA shifted-view path (12.1 ms/step of 'packed glue'
    HBM traffic at b4 — BASELINE.md round 5)."""
    from tactile_gan_tpu.ops.pallas.conv3x3 import conv3x3_packed_wgrad
    from tactile_gan_tpu.ops.packed_row import _wgrad_xla, pack_w

    rng = np.random.default_rng(17)
    C = Co = 64
    for (N, H, W) in [(1, 16, 16), (2, 8, 12)]:
        x = rng.normal(size=(N, H, W, C)).astype(np.float32)
        g = rng.normal(size=(N, H, W, Co)).astype(np.float32)
        xp = pack_w(jnp.asarray(x)).d
        gp = pack_w(jnp.asarray(g)).d
        want_m, want_l = _wgrad_xla(xp, gp, H, jnp.float32)
        got_m, got_l = conv3x3_packed_wgrad(xp, gp, h=H, interpret=True,
                                            compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                                   atol=1e-3, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                                   atol=1e-3, rtol=1e-5)


def test_packed_wgrad_shard_map_psum_matches_global():
    """The production mesh wiring of the wgrad kernel (_wgrad_impl's TPU
    branch: shard_map over the data axis + psum of the per-shard dB) is
    exercised on the CPU mesh with the interpreted kernel — the per-shard
    sums of batch slices must equal the global contraction."""
    from jax.sharding import Mesh, PartitionSpec as P

    from tactile_gan_tpu.ops.pallas.conv3x3 import conv3x3_packed_wgrad
    from tactile_gan_tpu.ops.packed_row import _wgrad_xla, pack_w

    rng = np.random.default_rng(29)
    N, H, W, C = 4, 8, 8, 64
    x = rng.normal(size=(N, H, W, C)).astype(np.float32)
    g = rng.normal(size=(N, H, W, C)).astype(np.float32)
    xp = pack_w(jnp.asarray(x)).d
    gp = pack_w(jnp.asarray(g)).d
    want_m, want_l = _wgrad_xla(xp, gp, H, jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))

    def shard(xl, gl):
        dbm, dbl = conv3x3_packed_wgrad(xl, gl, h=H,
                                        compute_dtype=jnp.float32,
                                        interpret=True)
        return jax.lax.psum(dbm, "data"), jax.lax.psum(dbl, "data")

    got_m, got_l = jax.jit(jax.shard_map(
        shard, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P(), P()), check_vma=False))(xp, gp)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               atol=1e-3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               atol=1e-3, rtol=1e-5)


def test_instance_norm_act_packed_matches_plain():
    """Packed-space IN (+relu) equals the NHWC instance_norm on the same
    data (single-pass sumsq stats vs two-pass: fp-noise only)."""
    from tactile_gan_tpu.ops.norm import instance_norm
    from tactile_gan_tpu.ops.packed_row import (
        instance_norm_act_packed, pack_w, unpack_w,
    )

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 6)).astype(np.float32) * 3 + 1)
    sc = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    off = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    want = jax.nn.relu(instance_norm(x, sc, off))
    got = unpack_w(instance_norm_act_packed(pack_w(x), sc, off, "relu"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_avg_pool2_packed_matches_plain():
    """ops/packed_row.py avg_pool2_packed: the packed-row 2x2 pool (parity-
    axis mean over a row-major reshape) is the EXACT arithmetic of
    unpack_w -> avg_pool2 — value and gradient."""
    from tactile_gan_tpu.ops.packed_row import (
        avg_pool2_packed, pack_w, unpack_w,
    )
    from tactile_gan_tpu.ops.pool import avg_pool2

    rng = np.random.default_rng(13)
    for (N, H, W, C) in [(2, 8, 12, 6), (1, 16, 16, 64)]:
        x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
        want = avg_pool2(x)
        got = avg_pool2_packed(pack_w(x))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

        def loss_plain(x2):
            return jnp.sum(jnp.sin(avg_pool2(unpack_w(pack_w(x2)))))

        def loss_packed(x2):
            return jnp.sum(jnp.sin(avg_pool2_packed(pack_w(x2))))

        ga = jax.grad(loss_plain)(x)
        gb = jax.grad(loss_packed)(x)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   atol=1e-6, rtol=1e-6)


def test_head1x1_packed_matches_plain_conv():
    """ops/packed_row.py head1x1_packed: the block-diagonal packed-space 1x1
    conv equals unpack_w -> plain 1x1 conv (+bias) in value and in both
    gradients (dK must arrive as the sum of the two diagonal blocks)."""
    from tactile_gan_tpu.ops.conv import conv2d
    from tactile_gan_tpu.ops.packed_row import head1x1_packed, pack_w, unpack_w

    rng = np.random.default_rng(17)
    for (N, H, W, C, F), cdt in [((2, 8, 10, 6, 3), None),
                                 ((1, 16, 16, 64, 3), jnp.bfloat16)]:
        x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 1, C, F)).astype(np.float32) * .2)
        b = jnp.asarray(rng.normal(size=(F,)).astype(np.float32))

        def plain(x2, k2, b2):
            y = conv2d(unpack_w(pack_w(x2)), k2, stride=1, padding=0,
                       compute_dtype=cdt)
            return y + b2[None, None, None, :]

        def packed(x2, k2, b2):
            return head1x1_packed(pack_w(x2), k2, b2, compute_dtype=cdt)

        want = plain(x, k, b)
        got = packed(x, k, b)
        tol = 3e-2 if cdt is not None else 1e-5
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=tol, rtol=1e-2 if cdt else 1e-5)

        for fn in (plain, packed):
            fn_grads = jax.grad(lambda *a: jnp.sum(jnp.sin(fn(*a))),
                                argnums=(0, 1, 2))(x, k, b)
            if fn is plain:
                ga = fn_grads
            else:
                gb = fn_grads
        gtol = 3e-2 if cdt is not None else 1e-5
        for a_, b_ in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a_),
                                       atol=gtol, rtol=1e-2 if cdt else 1e-5)
