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


def _kernel(x_slab, x_up, x_dn, bmid, blr, out, *, th, compute_dtype,
            ablate=()):
    hi = pl.program_id(1)
    n_h = pl.num_programs(1)
    w = x_slab.shape[2]
    c = x_slab.shape[3]
    co2 = bmid.shape[2]
    w2 = w // 2
    m = th * w2

    cd = compute_dtype

    def merge(ref, rows):
        # (1, rows, w, c) ref -> (rows*w/2, 2c): even w in lanes ..c, odd w
        # in lanes c.. . Mosaic supports strided loads on refs and lane
        # concatenation, but NOT the sublane->lane shape cast — so the pair
        # merge strides the ref directly. Stays f32: the Alr rolls below
        # only support 32-bit data.
        ev = ref[0, :, 0::2, :].reshape(rows * w2, c)
        od = ref[0, :, 1::2, :].reshape(rows * w2, c)
        return jnp.concatenate([ev, od], axis=1)

    if "merge" in ablate:  # cost probe: plain load, wrong numerics
        a_slab = jnp.concatenate(
            [x_slab[:].reshape(2 * m, c)[0:m], jnp.zeros((m, c), jnp.float32)],
            axis=1)
    else:
        a_slab = merge(x_slab, th)
    # The halo rows ARE the conv's zero padding at the image top/bottom: the
    # specs clamp their index there, so zero them out explicitly.
    zrow = jnp.zeros((w2, 2 * c), a_slab.dtype)
    a_up = jnp.where(hi == 0, zrow, merge(x_up, 1))
    a_dn = jnp.where(hi == n_h - 1, zrow, merge(x_dn, 1))
    # One extra zero row at each end makes the +/-1-sublane Alr shifts
    # below plain static slices (Mosaic's rotate is 32-bit-only and costs a
    # dynamic relayout; slices are cheap).
    one = jnp.zeros((1, 2 * c), a_slab.dtype)
    a_ext = jnp.concatenate([one, a_up, a_slab, a_dn, one], axis=0)

    # Alr for ALL dh offsets in one masked pass over the extended rows:
    # lanes c.. read the previous pair's odd element (shift down), lanes
    # ..c the next pair's even element (shift up); pairs at a w boundary
    # read the conv's zero w-padding instead. rowmod is the pair position
    # within its image row (a_ext rows are w2-aligned after the 1-row pad
    # is accounted for by the slice offsets).
    me = m + 2 * w2
    down = jax.lax.slice(a_ext, (0, 0), (me, 2 * c))
    up = jax.lax.slice(a_ext, (2, 0), (me + 2, 2 * c))
    rowmod = jax.lax.broadcasted_iota(jnp.int32, (me, 2 * c), 0) % w2
    lane = jax.lax.broadcasted_iota(jnp.int32, (me, 2 * c), 1)
    zero = jnp.zeros((me, 2 * c), a_ext.dtype)
    alr_ext = jnp.where(lane >= c,
                        jnp.where(rowmod == 0, zero, down),
                        jnp.where(rowmod == w2 - 1, zero, up))
    if "nolr" in ablate:
        alr_ext = None

    acc = jnp.zeros((m, co2), jnp.float32)
    for dh in (-1, 0, 1):
        off = (1 + dh) * w2
        a = jax.lax.slice(a_ext, (1 + off, 0), (1 + off + m, 2 * c))
        acc = acc + jnp.dot(a.astype(cd), bmid[dh + 1].astype(cd),
                            preferred_element_type=jnp.float32)
        if alr_ext is not None:
            alr = jax.lax.slice(alr_ext, (off, 0), (off + m, 2 * c))
            acc = acc + jnp.dot(alr.astype(cd), blr[dh + 1].astype(cd),
                                preferred_element_type=jnp.float32)

    # Unpack (m, 2co) -> (th, w, co): phase 0 lanes go to even w, phase 1
    # to odd w — strided stores (the lane->sublane shape cast is not
    # supported, but strided ref stores are).
    co = co2 // 2
    y = acc.astype(out.dtype).reshape(th, w2, co2)
    if "unpack" in ablate:  # cost probe: contiguous stores, wrong layout
        out[0, :, 0:w2, :] = y[:, :, :co]
        out[0, :, w2:, :] = y[:, :, co:]
    else:
        out[0, :, 0::2, :] = y[:, :, :co]
        out[0, :, 1::2, :] = y[:, :, co:]


@functools.partial(jax.jit,
                   static_argnames=("interpret", "compute_dtype", "block_h",
                                    "ablate"))
def conv3x3_p1(x: jax.Array, k: jax.Array, *, interpret: bool = False,
               compute_dtype=jnp.bfloat16, block_h: int = 8,
               ablate: tuple = ()) -> jax.Array:
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
        functools.partial(_kernel, th=th, compute_dtype=compute_dtype,
                          ablate=ablate),
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


# ---------------------------------------------------------------------------
# H-pair variant: same arithmetic with the pair axis on H instead of W.
#
# The w-pair kernel above computes at 71 TFLOP/s useful but loses 0.7 ms to
# its strided output stores: interleaving phases back into alternating w
# positions writes every (8,128) out tile twice at sub-tile granularity
# (measured, see BASELINE.md round 3). Packing (h, h+1) pairs instead makes
# every strided access COARSE — full (W, C) image rows — so the merge loads
# and unpack stores move whole tiles. The roles of dh and dw swap: the three
# dw taps become the +/-1-sublane masked shifts (w-boundary zero padding),
# and the cross-pair dh taps become +/-W-row static slices against halo
# PAIRS.
# ---------------------------------------------------------------------------


def _kernel_h(x_slab, x_up, x_dn, bmid, blr, out, *, th, compute_dtype):
    hi = pl.program_id(1)
    n_h = pl.num_programs(1)
    w = x_slab.shape[2]
    c = x_slab.shape[3]
    co2 = bmid.shape[2]
    th2 = th // 2
    m = th2 * w

    cd = compute_dtype

    def merge(ref, pairs):
        # (1, 2*pairs, w, c) ref -> (pairs*w, 2c): even h rows in lanes ..c,
        # odd h rows in lanes c.. — the strided loads grab whole (w, c)
        # planes (coarse, tile-aligned).
        ev = ref[0, 0::2, :, :].reshape(pairs * w, c)
        od = ref[0, 1::2, :, :].reshape(pairs * w, c)
        return jnp.concatenate([ev, od], axis=1)

    a_slab = merge(x_slab, th2)
    zpair = jnp.zeros((w, 2 * c), a_slab.dtype)
    a_up = jnp.where(hi == 0, zpair, merge(x_up, 1))
    a_dn = jnp.where(hi == n_h - 1, zpair, merge(x_dn, 1))
    a_ext = jnp.concatenate([a_up, a_slab, a_dn], axis=0)  # (m + 2w, 2c)

    # Center rows (same h2 pair) and the cross-pair lane mix: lanes c..
    # read the h2-1 pair's odd row, lanes ..c the h2+1 pair's even row.
    lane_me = jax.lax.broadcasted_iota(jnp.int32, (m, 2 * c), 1)
    a_c = jax.lax.slice(a_ext, (w, 0), (w + m, 2 * c))
    a_lr = jnp.where(lane_me >= c,
                     jax.lax.slice(a_ext, (0, 0), (m, 2 * c)),
                     jax.lax.slice(a_ext, (2 * w, 0), (2 * w + m, 2 * c)))

    # The three dw taps are +/-1-sublane shifts with zero w-padding at the
    # image's left/right edge. One zero row on both ends turns the shifts
    # into static slices; the w-boundary mask zeroes the wrapped rows.
    one = jnp.zeros((1, 2 * c), a_slab.dtype)
    rowpos = jax.lax.broadcasted_iota(jnp.int32, (m, 2 * c), 0) % w
    zero = jnp.zeros((m, 2 * c), a_slab.dtype)

    def shifted(base_ext, dw):
        s = jax.lax.slice(base_ext, (dw, 0), (dw + m, 2 * c))
        if dw == 0:  # w-1 tap: row 0 of each image row reads zero padding
            return jnp.where(rowpos == 0, zero, s)
        if dw == 2:  # w+1 tap
            return jnp.where(rowpos == w - 1, zero, s)
        return s

    ac_ext = jnp.concatenate([one, a_c, one], axis=0)
    alr_ext = jnp.concatenate([one, a_lr, one], axis=0)

    acc = jnp.zeros((m, co2), jnp.float32)
    for dw in (0, 1, 2):
        acc = acc + jnp.dot(shifted(ac_ext, dw).astype(cd),
                            bmid[dw].astype(cd),
                            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(shifted(alr_ext, dw).astype(cd),
                            blr[dw].astype(cd),
                            preferred_element_type=jnp.float32)

    # Unpack: phase p lanes go to h rows 2*h2+p — coarse strided stores of
    # whole (w, co) planes.
    co = co2 // 2
    y = acc.astype(out.dtype).reshape(th2, w, co2)
    out[0, 0::2, :, :] = y[:, :, :co]
    out[0, 1::2, :, :] = y[:, :, co:]


@functools.partial(jax.jit,
                   static_argnames=("interpret", "compute_dtype", "block_h"))
def conv3x3_p1_h(x: jax.Array, k: jax.Array, *, interpret: bool = False,
                 compute_dtype=jnp.bfloat16, block_h: int = 8) -> jax.Array:
    """H-pair variant of conv3x3_p1 (see block comment above)."""
    n, h, w, c = x.shape
    co = k.shape[3]
    th = block_h
    while h % th or th % 2:
        th -= 2
    th = max(th, 2)
    if h % th:
        raise ValueError(f"H={h} not divisible by an even block_h")
    # dh lives on the kernel's minor axis here: build B from the transposed
    # kernel so bmid[dw][(e,ci),(p,co)] = k[e-p+1, dw, ci, co].
    bmid, blr = _build_b(k.astype(jnp.float32).transpose(1, 0, 2, 3))

    grid = (n, h // th)
    slab_spec = pl.BlockSpec((1, th, w, c), lambda ni, hi: (ni, hi, 0, 0),
                             memory_space=pltpu.VMEM)
    # Halo PAIRS in units of 2 rows: pair h2-1 for the dh=-1 taps (only its
    # odd row is read), pair h2+th/2 for dh=+1 (only its even row).
    halo_spec = lambda dp: pl.BlockSpec(
        (1, 2, w, c),
        lambda ni, hi: (ni, jnp.clip(hi * (th // 2) + dp, 0, h // 2 - 1),
                        0, 0),
        memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((3, 2 * c, 2 * co), lambda ni, hi: (0, 0, 0),
                          memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_h, th=th, compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), jnp.float32),
        grid=grid,
        in_specs=[slab_spec, halo_spec(-1), halo_spec(th // 2),
                  b_spec, b_spec],
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


# ---------------------------------------------------------------------------
# Packed-layout variant: the kernel for a packed-resident row.
#
# The micro-probes (BASELINE.md round 3) showed the arithmetic pipeline runs
# at ~71 TFLOP/s useful, but any pallas block carrying a (W, 64) inner plane
# streams HBM at a fraction of peak (lane-padded tiles + small-plane DMA),
# and the in-kernel pair merge/unpack relayouts cost more than the matmuls.
# Flat (1, rows, 128) blocks stream at XLA speed (copy 0.207 ms vs XLA's
# 0.19 for the same 32 MB). So this kernel keeps the W-PAIR PACKED layout in
# HBM on both sides: x (N, H*W/2, 2C), y (N, H*W/2, 2Co) — dense 128-lane
# rows, zero relayouts in the kernel. Producers/consumers either stay packed
# too or pay one XLA reshape at the row boundary.
# ---------------------------------------------------------------------------


def _kernel_packed(x_slab, x_up, x_dn, bmid, blr, out, *, th, w2,
                   compute_dtype):
    hi = pl.program_id(1)
    n_h = pl.num_programs(1)
    c2 = x_slab.shape[2]
    co2 = bmid.shape[2]
    c = c2 // 2
    m = th * w2

    cd = compute_dtype
    a_slab = x_slab[0]
    zrow = jnp.zeros((w2, c2), a_slab.dtype)
    a_up = jnp.where(hi == 0, zrow, x_up[0])
    a_dn = jnp.where(hi == n_h - 1, zrow, x_dn[0])
    one = jnp.zeros((1, c2), a_slab.dtype)
    a_ext = jnp.concatenate([one, a_up, a_slab, a_dn, one], axis=0)

    me = m + 2 * w2
    down = jax.lax.slice(a_ext, (0, 0), (me, c2))
    up = jax.lax.slice(a_ext, (2, 0), (me + 2, c2))
    rowmod = jax.lax.broadcasted_iota(jnp.int32, (me, c2), 0) % w2
    lane = jax.lax.broadcasted_iota(jnp.int32, (me, c2), 1)
    zero = jnp.zeros((me, c2), a_ext.dtype)
    alr_ext = jnp.where(lane >= c,
                        jnp.where(rowmod == 0, zero, down),
                        jnp.where(rowmod == w2 - 1, zero, up))

    acc = jnp.zeros((m, co2), jnp.float32)
    for dh in (-1, 0, 1):
        off = (1 + dh) * w2
        a = jax.lax.slice(a_ext, (1 + off, 0), (1 + off + m, c2))
        acc = acc + jnp.dot(a.astype(cd), bmid[dh + 1].astype(cd),
                            preferred_element_type=jnp.float32)
        alr = jax.lax.slice(alr_ext, (off, 0), (off + m, c2))
        acc = acc + jnp.dot(alr.astype(cd), blr[dh + 1].astype(cd),
                            preferred_element_type=jnp.float32)

    out[0] = acc.astype(out.dtype)


@functools.partial(jax.jit,
                   static_argnames=("h", "interpret", "compute_dtype",
                                    "block_h"))
def conv3x3_packed(xp: jax.Array, k: jax.Array, *, h: int,
                   interpret: bool = False, compute_dtype=jnp.bfloat16,
                   block_h: int = 8) -> jax.Array:
    """3x3/s1/p1 conv in the packed layout.

    xp: (N, H*W/2, 2C) f32 — row (h*W/2 + w2), lanes (e, ci) for w = 2*w2+e.
    k:  (3, 3, C, Co) f32. Returns (N, H*W/2, 2Co) f32 in the same packing.
    ``h`` is the image height (W/2 = xp.shape[1] // h).
    """
    n, hp, c2 = xp.shape
    assert hp % h == 0
    w2 = hp // h
    co = k.shape[3]
    th = block_h
    while h % th:
        th //= 2
    bmid, blr = _build_b(k.astype(jnp.float32))

    grid = (n, h // th)
    slab_spec = pl.BlockSpec((1, th * w2, c2), lambda ni, hi: (ni, hi, 0),
                             memory_space=pltpu.VMEM)
    halo_spec = lambda dp: pl.BlockSpec(
        (1, w2, c2),
        lambda ni, hi: (ni, jnp.clip(hi * th + dp, 0, h - 1), 0),
        memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((3, c2, 2 * co), lambda ni, hi: (0, 0, 0),
                          memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel_packed, th=th, w2=w2,
                          compute_dtype=compute_dtype),
        # Output dtype follows the input: a bf16-resident packed row halves
        # the HBM traffic of every dense tile (f32 stays the default; the
        # f32 accumulator casts on the way out either way).
        out_shape=jax.ShapeDtypeStruct((n, hp, 2 * co), xp.dtype),
        grid=grid,
        in_specs=[slab_spec, halo_spec(-1), halo_spec(th), b_spec, b_spec],
        out_specs=pl.BlockSpec((1, th * w2, 2 * co),
                               lambda ni, hi: (ni, hi, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hp * c2 * 2 * co * 3,
            bytes_accessed=(n * hp * c2 + n * hp * 2 * co) * 4,
            transcendentals=0),
        interpret=interpret,
    )(xp, xp, xp, bmid, blr)


# ---------------------------------------------------------------------------
# Packed wgrad kernel (round 5).
#
# The packed conv's dk used to run as XLA einsums over MATERIALIZED shifted
# views: _shift_h (pad+slice) and _alr (pad+iota+select) each wrote a full
# (N, H*W/2, 2C) buffer to HBM, six of them per conv — the round-5 xplane
# decomposition showed this "packed glue" at 12.1 ms/step at b4, 2.7x the
# packed conv kernels themselves. This kernel builds the same six views
# IN VMEM (the exact code the forward kernel already runs) and accumulates
#   dBmid[dh] += A_dh^T   @ G
#   dBlr [dh] += Alr_dh^T @ G
# into two (3, 2C, 2Co) f32 output blocks pinned at block 0 across a
# sequential (N, H/TH) grid — zero HBM round trips for the views.
# _dk_from_db folds the result back to (3,3,C,Co) exactly as before; the
# only change vs the einsum form is f32 accumulation order.
# ---------------------------------------------------------------------------


def _kernel_packed_wgrad(x_slab, x_up, x_dn, g_slab, dbmid, dblr, *, th, w2,
                         compute_dtype):
    ni = pl.program_id(0)
    hi = pl.program_id(1)
    n_h = pl.num_programs(1)
    c2 = x_slab.shape[2]
    m = th * w2

    cd = compute_dtype
    a_slab = x_slab[0]
    zrow = jnp.zeros((w2, c2), a_slab.dtype)
    a_up = jnp.where(hi == 0, zrow, x_up[0])
    a_dn = jnp.where(hi == n_h - 1, zrow, x_dn[0])
    one = jnp.zeros((1, c2), a_slab.dtype)
    a_ext = jnp.concatenate([one, a_up, a_slab, a_dn, one], axis=0)

    me = m + 2 * w2
    down = jax.lax.slice(a_ext, (0, 0), (me, c2))
    up = jax.lax.slice(a_ext, (2, 0), (me + 2, c2))
    rowmod = jax.lax.broadcasted_iota(jnp.int32, (me, c2), 0) % w2
    lane = jax.lax.broadcasted_iota(jnp.int32, (me, c2), 1)
    zero = jnp.zeros((me, c2), a_ext.dtype)
    alr_ext = jnp.where(lane >= c2 // 2,
                        jnp.where(rowmod == 0, zero, down),
                        jnp.where(rowmod == w2 - 1, zero, up))

    @pl.when((ni == 0) & (hi == 0))
    def _init():
        dbmid[...] = jnp.zeros_like(dbmid)
        dblr[...] = jnp.zeros_like(dblr)

    g = g_slab[0].astype(cd)
    # A^T @ G: contract the m axis (axis 0 of both operands).
    tdims = (((0,), (0,)), ((), ()))
    for dh in (-1, 0, 1):
        off = (1 + dh) * w2
        a = jax.lax.slice(a_ext, (1 + off, 0), (1 + off + m, c2))
        dbmid[dh + 1] += jax.lax.dot_general(
            a.astype(cd), g, tdims, preferred_element_type=jnp.float32)
        alr = jax.lax.slice(alr_ext, (off, 0), (off + m, c2))
        dblr[dh + 1] += jax.lax.dot_general(
            alr.astype(cd), g, tdims, preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("h", "interpret", "compute_dtype",
                                    "block_h"))
def conv3x3_packed_wgrad(xp: jax.Array, g: jax.Array, *, h: int,
                         interpret: bool = False,
                         compute_dtype=jnp.bfloat16, block_h: int = 8):
    """dBmid, dBlr of the packed conv: xp (N,HP,2C), g (N,HP,2Co) ->
    ((3,2C,2Co), (3,2C,2Co)) f32. See the block comment above."""
    n, hp, c2 = xp.shape
    co2 = g.shape[2]
    assert hp % h == 0
    w2 = hp // h
    th = block_h
    while h % th:
        th //= 2

    grid = (n, h // th)
    slab_spec = pl.BlockSpec((1, th * w2, c2), lambda ni, hi: (ni, hi, 0),
                             memory_space=pltpu.VMEM)
    halo_spec = lambda dp: pl.BlockSpec(
        (1, w2, c2),
        lambda ni, hi: (ni, jnp.clip(hi * th + dp, 0, h - 1), 0),
        memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, th * w2, co2), lambda ni, hi: (ni, hi, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((3, c2, co2), lambda ni, hi: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel_packed_wgrad, th=th, w2=w2,
                          compute_dtype=compute_dtype),
        out_shape=(jax.ShapeDtypeStruct((3, c2, co2), jnp.float32),
                   jax.ShapeDtypeStruct((3, c2, co2), jnp.float32)),
        grid=grid,
        in_specs=[slab_spec, halo_spec(-1), halo_spec(th), g_spec],
        out_specs=(out_spec, out_spec),
        # Sequential grid: both outputs are revisited (accumulated) by every
        # step, so neither dimension may be parallel.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hp * c2 * co2 * 6,
            bytes_accessed=(n * hp * c2 + n * hp * co2) * 4,
            transcendentals=0),
        interpret=interpret,
    )(xp, xp, xp, g)


def pack_w(x: jax.Array) -> jax.Array:
    """(N,H,W,C) -> (N, H*W/2, 2C) packed view (XLA reshape)."""
    n, h, w, c = x.shape
    return x.reshape(n, h * w // 2, 2 * c)


def unpack_w(xp: jax.Array, h: int, co: int) -> jax.Array:
    """(N, H*W/2, 2Co) -> (N,H,W,Co) (XLA reshape)."""
    n, hp, _ = xp.shape
    return xp.reshape(n, h, 2 * (hp // h), co)
