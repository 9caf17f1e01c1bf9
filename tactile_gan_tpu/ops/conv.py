"""NHWC convolution primitives for TPU.

All tensors are NHWC (channels-last, so C maps onto the 128-wide lane
dimension of the VPU/MXU) and kernels are HWIO. XLA lowers these
``conv_general_dilated`` calls straight onto the MXU; elementwise epilogues
(norm/activation) fuse into them.

Geometry matches the PyTorch layers the reference uses so that parity goldens
hold exactly:

- ``conv2d``            ↔ nn.Conv2d(k, stride, padding)
  (reference generator blocks: /root/reference/generators/UNet.py:21-27,
   discriminator: /root/reference/discriminators/PatchDiscriminator.py:14)
- ``conv2d_transpose``  ↔ nn.ConvTranspose2d(k, stride, padding)
  (/root/reference/generators/UNet.py:40, BCDUNet.py:135-137)
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

_DN = lax.conv_dimension_numbers  # cached builder below

# Residency knob (scripts/probe_deep_bf16.py measured it; production
# threads the per-call ``resident`` flag instead): when a conv is
# "resident", its low-precision output keeps the compute dtype instead of
# upcasting to f32 — bf16-resident activations for the DENSE (C>=128) deep
# rows halve their HBM traffic (b16 XLA step 92.4 -> 99.3 img/s). The
# narrow-C rows measured slower bf16-resident in round 1 (NHWC (16,128)
# tile padding), but those are packed now (ops/packed_row.py).
RESIDENT_COMPUTE_DTYPE = False


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def _pack2_w(kernel: jax.Array) -> jax.Array:
    """(kh,kw,cin,co) -> (kh,kw+1,cin,2co): the kernel embedded at w-offsets
    0 (even outputs) and 1 (odd outputs) in disjoint cout halves. The extra
    taps are exact zeros, so a stride-(., 2) conv with this kernel computes
    two horizontally adjacent outputs per window — identical numerics, both
    MXU output-lane halves doing useful work."""
    kh, kw, cin, co = kernel.shape
    kp = jnp.zeros((kh, kw + 1, cin, 2 * co), kernel.dtype)
    kp = kp.at[:, 0:kw, :, 0:co].set(kernel)
    kp = kp.at[:, 1:kw + 1, :, co:].set(kernel)
    return kp


def _unpack2_w(y: jax.Array, co: int) -> jax.Array:
    """(N,H,W/2,2co) packed output -> (N,H,W,co). Pure reshape: the packed
    channel index is (phase, co) with phase major, and (W/2, phase) are
    adjacent axes, so no transpose is involved."""
    n, h, w2, _ = y.shape
    return y.reshape(n, h, w2, 2, co).reshape(n, h, 2 * w2, co)


def _w_packable(kernel, stride, padding, w, cout) -> bool:
    """Lane-packing applies to the 3x3/s1/p1 convs whose cout fills at most
    half the 128 MXU output lanes (the UNet++ row-0 shape at nf<=64,
    /root/reference/generators/UNet_plusplus.py:72-84)."""
    return (kernel.shape[:2] == (3, 3) and _pair(stride) == (1, 1)
            and _pair(padding) == (1, 1) and w % 2 == 0 and cout <= 64)


def _packed_with_plain_bwd(packed_fn, plain_fn, x, kernel, compute_dtype):
    """Run ``packed_fn`` forward but differentiate as ``plain_fn``.

    The w-packed forward wins (+22-24% isolated, probe_wpack) but its
    autodiff backward loses: the packed conv's dgrad is a stride-2
    lhs-dilated conv that XLA lowers poorly at small batch (-7..10%,
    probe_wpack). The two formulations are the same function, so their VJPs
    agree (FP order aside) — this custom_vjp pairs the packed forward with
    the PLAIN formulation's standard dgrad/wgrad. The jax.vjp primal
    re-execution inside bwd is dead code (a conv's transpose rule never
    reads the primal output), so XLA DCEs it.

    Returns the PACKED (N,H,W/2,2co) output; callers unpack once.
    """
    co = kernel.shape[3]

    @jax.custom_vjp
    def f(x, k):
        return packed_fn(x, k, compute_dtype)

    def fwd(x, k):
        return packed_fn(x, k, compute_dtype), (x, k)

    def bwd(res, g):
        xr, kr = res
        _, pullback = jax.vjp(
            lambda a, b: plain_fn(a, b, compute_dtype), xr, kr)
        return pullback(_unpack2_w(g, co))

    f.defvjp(fwd, bwd)
    return f(x, kernel)


def _conv_plain3x3(x, kernel, compute_dtype):
    """The plain 3x3/s1/p1 formulation (bwd twin of _conv_packed_plain)."""
    x_c, k_c, low_precision = _cast_operands(x, kernel.astype(jnp.float32),
                                             compute_dtype)
    dn = lax.conv_dimension_numbers(x_c.shape, k_c.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x_c, k_c, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=dn,
        preferred_element_type=None if low_precision else jnp.float32,
    )
    return out.astype(jnp.float32) if low_precision else out


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[int, Tuple[int, int]] = 0,
    bias: Optional[jax.Array] = None,
    compute_dtype: Optional[jnp.dtype] = None,
    lane_pack: bool = False,
    resident: bool = False,
) -> jax.Array:
    """2-D convolution, x: [N,H,W,Cin], kernel: [kh,kw,Cin,Cout].

    ``padding`` is symmetric per spatial dim (torch semantics).
    ``compute_dtype`` casts inputs for MXU-friendly bf16 compute; the result
    is accumulated and returned in float32.
    ``lane_pack`` enables the exact w-packed form for narrow-cout 3x3 convs
    (see _pack2_w; measurements in BASELINE.md).
    """
    if lane_pack and _w_packable(kernel, stride, padding, x.shape[2],
                                 kernel.shape[3]):
        co = kernel.shape[3]
        y = _packed_with_plain_bwd(_conv_packed_plain, _conv_plain3x3,
                                   x, kernel, compute_dtype)
        out = _unpack2_w(y, co)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        # Honor the residency contract on this early return too (ADVICE r3):
        # lane-packed conv outputs otherwise stayed f32 even when the caller
        # asked for bf16-resident activations.
        if (resident and compute_dtype is not None
                and jnp.dtype(compute_dtype) != jnp.float32):
            out = out.astype(compute_dtype)
        return out
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    x, kernel, low_precision = _cast_operands(x, kernel, compute_dtype)
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=dn,
        preferred_element_type=None if low_precision else jnp.float32,
    )
    # Low-precision convs run the MXU in bf16 (f32 internal accumulate) and
    # upcast the result explicitly. MEASURED on v5e (full G+D step, UNet++
    # nf=64 b4 256^2): keeping activations bf16 end to end is ~12% SLOWER
    # (22.1 vs 25.2 img/s) — the (16,128) bf16 tile shape penalizes the
    # narrow C=64 layers more than the halved HBM traffic saves — so f32
    # activations between ops is the fast configuration. (Requesting an f32
    # preferred_element_type on bf16 operands instead would break the conv
    # transpose rule under jax.grad.)
    if low_precision and not (resident or RESIDENT_COMPUTE_DTYPE):
        out = out.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _conv_packed_plain(x, kernel, compute_dtype):
    """The w-packed 3x3/s1/p1 conv: one stride-(1,2) conv with the
    _pack2_w kernel; returns the PACKED (N,H,W/2,2co) output."""
    kp = _pack2_w(kernel.astype(jnp.float32))
    x_c, kp_c, low_precision = _cast_operands(x, kp, compute_dtype)
    dn = lax.conv_dimension_numbers(x_c.shape, kp_c.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x_c, kp_c, window_strides=(1, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=dn,
        preferred_element_type=None if low_precision else jnp.float32,
    )
    return out.astype(jnp.float32) if low_precision else out


def conv2d_multi(
    xs,
    kernel: jax.Array,
    *,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[int, Tuple[int, int]] = 0,
    bias: Optional[jax.Array] = None,
    compute_dtype: Optional[jnp.dtype] = None,
    lane_pack: bool = False,
    resident: bool = False,
) -> jax.Array:
    """conv2d over a channel-concatenation WITHOUT materializing it.

    ``conv(concat(xs, -1), W) == sum_i conv(xs[i], W[:, :, off_i:off_i+c_i])``
    exactly (same parameters, same MXU FLOPs, FP summation order aside), but
    the wide concat tensor never round-trips HBM. This is the hot pattern of
    the UNet++ nested nodes (/root/reference/generators/UNet_plusplus.py:72-84),
    whose concats at full resolution are pure memory traffic.
    """
    from tactile_gan_tpu.ops.resize import Up2

    total_c = sum(x.shape[-1] for x in xs)
    if total_c != kernel.shape[2]:
        # Validate BEFORE slicing: an over-wide input list would otherwise
        # surface as an opaque lax.slice_in_dim out-of-bounds error.
        raise ValueError(
            f"input channels {total_c} != kernel input width {kernel.shape[2]}")
    out = None
    off = 0
    fold_up = (kernel.shape[:2] == (3, 3) and _pair(stride) == (1, 1)
               and _pair(padding) == (1, 1))
    # Lane-packed accumulation: every piece (plain and folded-up alike) can
    # emit the packed (N,H,W/2,2co) layout, so the sum stays packed and the
    # unpack reshape happens once.
    pack = (lane_pack and fold_up and kernel.shape[3] <= 64
            and all(isinstance(x, Up2) or x.shape[2] % 2 == 0 for x in xs))
    for x in xs:
        c = x.shape[-1]
        k_piece = (kernel if len(xs) == 1
                   else lax.slice_in_dim(kernel, off, off + c, axis=2))
        if isinstance(x, Up2):
            if fold_up and pack:
                part = _packed_with_plain_bwd(
                    _conv3x3_on_up2_packed, _conv3x3_on_up2,
                    x.x, k_piece, compute_dtype)
            elif fold_up:
                part = _conv3x3_on_up2(x.x, k_piece, compute_dtype)
            else:
                part = conv2d(x.materialize(), k_piece, stride=stride,
                              padding=padding, compute_dtype=compute_dtype)
        elif pack:
            part = _packed_with_plain_bwd(_conv_packed_plain, _conv_plain3x3,
                                          x, k_piece, compute_dtype)
        else:
            part = conv2d(x, k_piece, stride=stride, padding=padding,
                          compute_dtype=compute_dtype)
        out = part if out is None else out + part
        off += c
    if pack:
        out = _unpack2_w(out, kernel.shape[3])
    if bias is not None:
        out = out + bias.astype(out.dtype)
    # Residency: pieces accumulate in f32; one cast at the end.
    if (resident and compute_dtype is not None
            and jnp.dtype(compute_dtype) != jnp.float32):
        out = out.astype(compute_dtype)
    return out


def _conv3x3_on_up2(b, kernel, compute_dtype):
    """conv2d(upsample_nearest2(b), kernel, padding=1) without ever forming
    the upsample, as ONE stride-2 lhs-dilated (transposed) convolution:
    nearest-up2 is zero-stuffing followed by a 2x2-ones blur, so the
    composition collapses to a 4x4 kernel k4 = k3 (*) ones(2,2) on the
    zero-stuffed coarse grid.

    Exact (the 4x4 taps are sums of the 3x3 taps — the same tap-merging as
    the earlier 4-phase form, FP association aside) and 2.25x fewer useful
    MACs than the materialized form. One XLA op replaces four phase convs +
    a phase-interleave transpose; measured on v5e for the 128->256 row-0
    node at C=64: fwd 0.41 -> 0.26 ms, fwd+bwd 0.87 -> 0.50 ms.
    """
    # Tap-merge in f32 before any downcast (sums of params stay exact).
    k = kernel.astype(jnp.float32)
    k4 = jnp.zeros((4, 4) + kernel.shape[2:], jnp.float32)
    for di in range(2):
        for dj in range(2):
            k4 = k4.at[di:di + 3, dj:dj + 3].add(k)
    b_c, k4_c, low_precision = _cast_operands(b, k4, compute_dtype)
    dn = lax.conv_dimension_numbers(b_c.shape, k4_c.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        b_c, k4_c, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=dn,
        preferred_element_type=None if low_precision else jnp.float32,
    )
    if low_precision:
        out = out.astype(jnp.float32)
    return out


def _conv3x3_on_up2_packed(b, kernel, compute_dtype):
    """w-packed variant of _conv3x3_on_up2: the 4x4 tap-merged kernel is
    embedded at dilated-w offsets 0/1 into disjoint cout halves ((4,5) wide)
    and the lhs-dilated conv strides 2 in w, emitting the packed
    (N,H,W/2,2co) layout directly — two fine output columns per window, both
    MXU lane halves busy. Exact: the extra taps are zeros."""
    k = kernel.astype(jnp.float32)
    k4 = jnp.zeros((4, 4) + kernel.shape[2:], jnp.float32)
    for di in range(2):
        for dj in range(2):
            k4 = k4.at[di:di + 3, dj:dj + 3].add(k)
    co = kernel.shape[3]
    kp = jnp.zeros((4, 5) + kernel.shape[2:3] + (2 * co,), jnp.float32)
    kp = kp.at[:, 0:4, :, 0:co].set(k4)
    kp = kp.at[:, 1:5, :, co:].set(k4)
    b_c, kp_c, low_precision = _cast_operands(b, kp, compute_dtype)
    dn = lax.conv_dimension_numbers(b_c.shape, kp_c.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        b_c, kp_c, window_strides=(1, 2), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=dn,
        preferred_element_type=None if low_precision else jnp.float32,
    )
    return out.astype(jnp.float32) if low_precision else out


def _cast_operands(x, kernel, compute_dtype):
    if compute_dtype is None or jnp.dtype(compute_dtype) == jnp.float32:
        return x, kernel, False
    return x.astype(compute_dtype), kernel.astype(compute_dtype), True


def conv2d_transpose(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: Union[int, Tuple[int, int]] = 2,
    padding: Union[int, Tuple[int, int]] = 0,
    bias: Optional[jax.Array] = None,
    compute_dtype: Optional[jnp.dtype] = None,
    resident: bool = False,
) -> jax.Array:
    """Transposed conv matching nn.ConvTranspose2d(k, stride, padding).

    x: [N,H,W,Cin], kernel: [kh,kw,Cin,Cout] (Cin = input channels of *this*
    op). Output spatial size = (H-1)*stride - 2*padding + k.

    Implemented as the standard input-dilated convolution: dilate the input by
    ``stride``, pad by ``k - 1 - padding``, and convolve with the spatially
    flipped kernel. XLA lowers this onto the MXU like a regular conv.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    x, kernel, low_precision = _cast_operands(x, kernel, compute_dtype)
    # Flip spatially; the dilated-conv formulation of the transpose.
    k_flip = kernel[::-1, ::-1, :, :]
    dn = lax.conv_dimension_numbers(x.shape, k_flip.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x,
        k_flip,
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=dn,
        preferred_element_type=None if low_precision else jnp.float32,
    )
    if low_precision and not (resident or RESIDENT_COMPUTE_DTYPE):
        out = out.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
