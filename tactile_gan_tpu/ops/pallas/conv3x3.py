"""Pallas TPU kernel: 3x3/s1/p1 convolution for narrow-cout rows.

The UNet++ row-0 convs (cout = nf = 64, /root/reference/generators/
UNet_plusplus.py:72-84) fill only half the MXU's 128 output lanes, and XLA
schedules them at ~32 TFLOP/s (round-2 xplane analysis; the --space_to_depth
variant proves +44% whole-step headroom by changing the network). The exact
w-packed XLA rewrite (ops/conv.py lane_pack) recovers part of that on the
XLA norm path but loses on the Pallas path to the packed<->unpacked layout
copies at the custom-call boundary.

This kernel keeps the packing ON-CHIP: standard NHWC in, standard NHWC out,
with the pair-merge relayout done in VMEM where it costs no HBM round trip.

Formulation (pair rows: W/2 sublanes x 128 lanes):

  A[w2, e*C+ci]        = x[h+dh, 2*w2+e, ci]      e in {0,1}   (pure reshape)
  y[w2, p*Co+co]       = sum_dh  A_dh @ Bmid_dh  +  Alr_dh @ Blr_dh

  Bmid[(e,ci),(p,co)]  = k[dh, e-p+1, ci, co]     -- FULLY dense
  Blr [(1,ci),(0,co)]  = k[dh, 0, ci, co]         -- the w2-1 pair's e=1 tap
  Blr [(0,ci),(1,co)]  = k[dh, 2, ci, co]         -- the w2+1 pair's e=0 tap
  Alr[:, C:]           = A[w2-1, C:] (roll down)  |  Alr[:, :C] = A[w2+1, :C]

Per dh that is one dense (M,2C)@(2C,2Co) matmul plus one half-dense one:
9 useful taps of 12 -> 75% useful MACs with all 2*Co output lanes busy, vs
XLA's 50% lane occupancy on the plain conv. The grid walks (N, H/TH) slabs
of TH image rows; the three dh operands are static slices of one
((TH+2)*W/2, 2C) extended A built from the slab plus two single-row halo
blocks, so M = TH*W/2 (1024 at the 256^2 row-0 shapes). The unpack back to
(TH, W, Co) is a pure row-major reshape in VMEM.

Backward stays on XLA's standard dgrad/wgrad through the same custom-VJP
plumbing as the lane_pack convs (ops/conv.py _packed_with_plain_bwd): the
packed formulations' autodiff transposes were measured slower (probe_wpack),
and second-order autodiff never reaches the generator (the gradient penalty
differentiates only the discriminator).

Restrictions (the row-0 shapes; everything else keeps the XLA path):
  kernel 3x3, stride 1, padding 1, 2*C and 2*Co <= 128, W even.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supported(x_shape, k_shape) -> bool:
    """The shapes this kernel handles (see module docstring)."""
    if len(x_shape) != 4 or len(k_shape) != 4:
        return False
    n, h, w, c = x_shape
    kh, kw, kc, co = k_shape
    return (kh == 3 and kw == 3 and kc == c and w % 2 == 0
            and 2 * c <= 128 and 2 * co <= 128 and h >= 2 and w >= 4)


def _build_b(k: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(3,3,C,Co) -> Bmid, Blr of (3, 2C, 2Co) (see module docstring)."""
    kh, kw, c, co = k.shape
    bmid = jnp.zeros((3, 2 * c, 2 * co), k.dtype)
    for e in (0, 1):
        for p in (0, 1):
            bmid = bmid.at[:, e * c:(e + 1) * c,
                           p * co:(p + 1) * co].set(k[:, e - p + 1])
    blr = jnp.zeros((3, 2 * c, 2 * co), k.dtype)
    blr = blr.at[:, c:2 * c, 0:co].set(k[:, 0])
    blr = blr.at[:, 0:c, co:2 * co].set(k[:, 2])
    return bmid, blr


def _kernel(x_slab, x_up, x_dn, bmid, blr, out, *, th, compute_dtype):
    hi = pl.program_id(1)
    n_h = pl.num_programs(1)
    w = x_slab.shape[2]
    c = x_slab.shape[3]
    co2 = bmid.shape[2]
    w2 = w // 2
    m = th * w2

    cd = compute_dtype
    a_slab = x_slab[0].reshape(m, 2 * c).astype(cd)
    # The halo rows ARE the conv's zero padding at the image top/bottom: the
    # specs clamp their index there, so zero them out explicitly.
    a_up = jnp.where(hi == 0, jnp.zeros((w2, 2 * c), cd),
                     x_up[0, 0].reshape(w2, 2 * c).astype(cd))
    a_dn = jnp.where(hi == n_h - 1, jnp.zeros((w2, 2 * c), cd),
                     x_dn[0, 0].reshape(w2, 2 * c).astype(cd))
    a_ext = jnp.concatenate([a_up, a_slab, a_dn], axis=0)

    # w2 position of each A row within its image row: the roll that builds
    # Alr crosses image-row boundaries, which must read the conv's zero
    # w-padding instead.
    rowmod = jax.lax.broadcasted_iota(jnp.int32, (m, 2 * c), 0) % w2
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, 2 * c), 1)
    zero = jnp.zeros((m, 2 * c), cd)

    acc = jnp.zeros((m, co2), jnp.float32)
    for dh in (-1, 0, 1):
        a = jax.lax.slice(a_ext, ((1 + dh) * w2, 0), ((1 + dh) * w2 + m, 2 * c))
        acc = acc + jnp.dot(a, bmid[dh + 1].astype(cd),
                            preferred_element_type=jnp.float32)
        down = pltpu.roll(a, 1, 0)
        up = pltpu.roll(a, m - 1, 0)
        alr = jnp.where(lane >= c,
                        jnp.where(rowmod == 0, zero, down),
                        jnp.where(rowmod == w2 - 1, zero, up))
        acc = acc + jnp.dot(alr, blr[dh + 1].astype(cd),
                            preferred_element_type=jnp.float32)

    out[0] = acc.reshape(th, w, co2 // 2)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "compute_dtype", "block_h"))
def conv3x3_p1(x: jax.Array, k: jax.Array, *, interpret: bool = False,
               compute_dtype=jnp.bfloat16, block_h: int = 8) -> jax.Array:
    """3x3/s1/p1 conv, x (N,H,W,C) f32, k (3,3,C,Co) f32 -> (N,H,W,Co) f32.

    Forward only — wrap with ops/conv.py's plain-backward custom VJP for
    training. ``interpret`` runs the Mosaic interpreter (CPU tests).
    """
    n, h, w, c = x.shape
    co = k.shape[3]
    th = block_h
    while h % th:
        th //= 2
    bmid, blr = _build_b(k.astype(jnp.float32))

    grid = (n, h // th)
    slab_spec = pl.BlockSpec((1, th, w, c), lambda ni, hi: (ni, hi, 0, 0),
                             memory_space=pltpu.VMEM)
    halo_spec = lambda dh: pl.BlockSpec(
        (1, 1, w, c),
        lambda ni, hi: (ni, jnp.clip(hi * th + dh, 0, h - 1), 0, 0),
        memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((3, 2 * c, 2 * co), lambda ni, hi: (0, 0, 0),
                          memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, th=th, compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), jnp.float32),
        grid=grid,
        in_specs=[slab_spec, halo_spec(-1), halo_spec(th), b_spec, b_spec],
        out_specs=pl.BlockSpec((1, th, w, co), lambda ni, hi: (ni, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * (w // 2) * (2 * c) * (2 * co) * 6,
            bytes_accessed=(n * h * w * c + n * h * w * co) * 4,
            transcendentals=0),
        interpret=interpret,
    )(x, x, x, bmid, blr)
    return out
