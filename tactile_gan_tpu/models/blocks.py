"""Shared flax building blocks.

Initialization reproduces the reference's ``init_weights``
(/root/reference/util.py:23-34): conv / transposed-conv kernels ~ N(0, 0.02),
biases zero; instance-norm affine parameters keep their (1, 0) defaults (the
reference never re-initializes InstanceNorm2d).

All modules are NHWC. ``compute_dtype`` selects the conv MXU dtype (bf16 by
default in training); parameters are always float32.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tactile_gan_tpu.ops.conv import conv2d, conv2d_multi, conv2d_transpose
from tactile_gan_tpu.ops.norm import instance_norm
from tactile_gan_tpu.ops import pallas as pallas_ops

conv_kernel_init = nn.initializers.normal(stddev=0.02)


def apply_norm_act(
    x: jax.Array,
    scale: Optional[jax.Array],
    offset: Optional[jax.Array],
    act: Optional[str],
    *,
    use_pallas: bool = False,
    negative_slope: float = 0.2,
) -> jax.Array:
    """Instance-norm followed by an optional activation.

    With ``use_pallas`` the fused single-VMEM-pass kernel is used
    (ops/pallas/instance_norm.py); otherwise XLA fuses the unfused form.
    """
    if use_pallas:
        # The fused kernels are dtype-generic on the activation side (round
        # 4): statistics always accumulate in f32 in VMEM scratch; a
        # bf16-resident input stays bf16 through the kernel I/O (halved HBM
        # traffic on dense tiles). Anything else upcasts to f32.
        if x.dtype not in (jnp.float32, jnp.bfloat16):
            x = x.astype(jnp.float32)
        return pallas_ops.instance_norm_act(
            x, scale, offset, act=act, negative_slope=negative_slope
        )
    y = instance_norm(x, scale, offset)
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "leaky_relu":
        y = jax.nn.leaky_relu(y, negative_slope=negative_slope)
    return y


class Conv(nn.Module):
    """Plain conv with torch-compatible geometry (see ops/conv.py)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    lane_pack: bool = False
    # Keep the low-precision compute dtype in the OUTPUT (bf16-resident
    # activations): halves HBM traffic for dense C>=128 rows (BASELINE.md
    # round 3). Off for narrow rows and wherever f32 between ops matters.
    resident: bool = False
    # Emit the packed row-0 layout (ops/packed_row.py): requires a 3x3/s1/p1
    # conv with 2*features <= 128; inputs may be PackedW, Up2, or NHWC
    # pieces. Same parameters as the plain path — checkpoints are
    # interchangeable.
    packed_out: bool = False

    @nn.compact
    def __call__(self, x):
        # A list/tuple input means "conv of the channel-concat of these",
        # computed concat-free (same parameter shape — checkpoints are
        # interchangeable with the concatenated form; see ops.conv2d_multi).
        # A bare Up2 marker is a single lazily-upsampled part — it must NOT
        # fall into the tuple branch (Up2 is a NamedTuple: iterating it
        # would yield the raw coarse tensor and silently convolve at half
        # resolution). PackedW likewise.
        from tactile_gan_tpu.ops.packed_row import (
            PackedW, conv2d_multi_packed, head1x1_packed,
        )
        from tactile_gan_tpu.ops.resize import Up2

        if isinstance(x, (Up2, PackedW)):
            x = [x]
        parts = x if isinstance(x, (list, tuple)) else None
        cin = sum(t.shape[-1] for t in parts) if parts else x.shape[-1]
        k = self.param(
            "kernel", conv_kernel_init,
            (self.kernel_size, self.kernel_size, cin, self.features), jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        if (self.kernel_size == 1 and parts and len(parts) == 1
                and isinstance(parts[0], PackedW)):
            # The 1x1 head of a packed row runs in packed space and unpacks
            # for free (see head1x1_packed) — same params as the NHWC conv.
            return head1x1_packed(parts[0], k, b,
                                  compute_dtype=self.compute_dtype)
        if self.packed_out or (parts and any(isinstance(t, PackedW)
                                             for t in parts)):
            if (self.kernel_size, self.stride, self.padding) != (3, 1, 1):
                raise ValueError("packed conv supports only 3x3/s1/p1")
            return conv2d_multi_packed(
                parts if parts else [x], k, bias=b,
                compute_dtype=self.compute_dtype)
        if parts:
            return conv2d_multi(
                parts, k, stride=self.stride, padding=self.padding, bias=b,
                compute_dtype=self.compute_dtype, lane_pack=self.lane_pack,
                resident=self.resident,
            )
        return conv2d(
            x, k, stride=self.stride, padding=self.padding, bias=b,
            compute_dtype=self.compute_dtype, lane_pack=self.lane_pack,
            resident=self.resident,
        )


class ConvTranspose(nn.Module):
    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.param(
            "kernel", conv_kernel_init,
            (self.kernel_size, self.kernel_size, cin, self.features), jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        return conv2d_transpose(
            x, k, stride=self.stride, padding=self.padding, bias=b,
            compute_dtype=self.compute_dtype,
        )


class InstanceNorm(nn.Module):
    affine: bool = True
    act: Optional[str] = None  # fused activation: None | 'relu' | 'leaky_relu'
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        from tactile_gan_tpu.ops.packed_row import (
            PackedW, instance_norm_act_packed,
        )

        c = x.channels if isinstance(x, PackedW) else x.shape[-1]
        scale = offset = None
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            offset = self.param("offset", nn.initializers.zeros, (c,), jnp.float32)
        if isinstance(x, PackedW):
            # Packed-space IN: lane reductions folded over the two w-phases
            # — plain XLA, fuses with neighbours, differentiable.
            return instance_norm_act_packed(x, scale, offset, self.act)
        return apply_norm_act(x, scale, offset, self.act, use_pallas=self.use_pallas)


class ConvNormRelu(nn.Module):
    """conv → instance-norm → ReLU, the unit every generator block repeats."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False
    affine_norm: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    lane_pack: bool = False
    packed: bool = False  # keep the activation in the packed row-0 layout
    resident: bool = False  # bf16-resident activations (dense rows)

    @nn.compact
    def __call__(self, x):
        x = Conv(
            self.features, self.kernel_size, self.stride, self.padding,
            use_bias=self.use_bias, compute_dtype=self.compute_dtype,
            lane_pack=self.lane_pack, packed_out=self.packed,
            resident=self.resident, name="conv",
        )(x)
        return InstanceNorm(
            affine=self.affine_norm, act="relu", use_pallas=self.use_pallas,
            name="norm",
        )(x)


class DownBlock(nn.Module):
    """UNet encoder stage: (conv4x4 s2 → IN → ReLU) → (conv3x3 s1 → IN → ReLU).

    Capability parity with ConvDown (/root/reference/generators/UNet.py:17-33).
    """

    features: int
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        x = ConvNormRelu(
            self.features, kernel_size=4, stride=2, padding=1,
            compute_dtype=self.compute_dtype, use_pallas=self.use_pallas, name="down",
        )(x)
        return ConvNormRelu(
            self.features, compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas, name="refine",
        )(x)


class UpBlock(nn.Module):
    """UNet decoder stage: (convT4x4 s2 → IN → ReLU) → (conv3x3 s1 → IN → ReLU).

    Capability parity with DeconvUp (/root/reference/generators/UNet.py:36-51).
    """

    features: int
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        x = ConvTranspose(
            self.features, kernel_size=4, stride=2, padding=1, use_bias=False,
            compute_dtype=self.compute_dtype, name="up",
        )(x)
        x = InstanceNorm(act="relu", use_pallas=self.use_pallas, name="norm")(x)
        return ConvNormRelu(
            self.features, compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas, name="refine",
        )(x)


class DoubleConvBlock(nn.Module):
    """Two conv3x3 → IN → ReLU units at constant width.

    With ``use_bias=False, affine_norm=True`` this is UNet++'s ConvBlock
    (/root/reference/generators/UNet_plusplus.py:18-34); with
    ``use_bias=True, affine_norm=False`` it is BCDUNet's conv_block
    (/root/reference/generators/BCDUNet.py:120-128).
    """

    features: int
    use_bias: bool = False
    affine_norm: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    lane_pack: bool = False
    packed: bool = False  # packed row-0 layout in and out (ops/packed_row.py)
    resident: bool = False  # bf16-resident activations (dense rows)

    @nn.compact
    def __call__(self, x):
        for name in ("a", "b"):
            x = ConvNormRelu(
                self.features, use_bias=self.use_bias,
                affine_norm=self.affine_norm, compute_dtype=self.compute_dtype,
                use_pallas=self.use_pallas, lane_pack=self.lane_pack,
                packed=self.packed, resident=self.resident, name=name,
            )(x)
        return x


class Head(nn.Module):
    """1x1 projection head with optional Tanh — the reference's
    FeatureMapBlock (/root/reference/generators/UNet.py:4-15)."""

    features: int
    activation: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(
            self.features, kernel_size=1, padding=0, use_bias=True,
            compute_dtype=self.compute_dtype, name="proj",
        )(x)
        # Head output always in float32: it feeds losses / image writers.
        x = x.astype(jnp.float32)
        return jnp.tanh(x) if self.activation else x
