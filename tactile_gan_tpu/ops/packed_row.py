"""Packed-resident row-0 operations (the round-3 MXU-occupancy design).

At nf=64 the UNet++ full-resolution row convs (cout=64,
/root/reference/generators/UNet_plusplus.py:72-84) fill half the MXU's 128
output lanes and pay the (…,64) lane-padding tax on every HBM access. The
W-PAIR PACKED layout fixes both WITHOUT changing the network: a row-0
feature map (N,H,W,C) lives as ``(N, H*W/2, 2C)`` — row (h*W/2 + w2), lanes
(e, ci) for w = 2*w2 + e. This is the plain row-major flattening, so
pack/unpack are single XLA reshapes, and every lane-tile is dense.

Measured on v5e (BASELINE.md round 3): the packed Pallas conv runs the
256² b4 cout=64 conv at 0.278 ms (69.5 TFLOP/s useful) vs XLA's 0.649 ms,
and packed-space instance norm is a lane reduction XLA fuses for free — a
full conv→IN→relu→conv→IN→relu node measured 0.53 ms packed vs 6.19 XLA.
The win requires the whole row to STAY packed; these ops provide the
packed-resident node pieces plus the boundary converters.

Gradients: ``packed_conv3x3`` carries a custom VJP that never leaves the
packed layout — dx is the SAME Pallas kernel with the rotated-transposed
kernel (the transpose of a SAME-padded 3x3/s1 conv is such a conv), and dk
contracts the shifted input views against the cotangent with plain XLA
matmuls, folded back to (3,3,C,Co) by the transpose of the B-matrix
embedding. Off-TPU every path falls back to an exact XLA formulation of the
same arithmetic (fast enough for tests; no interpreter involved).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tactile_gan_tpu.ops.pallas.conv3x3 import (
    _build_b, conv3x3_packed, conv3x3_packed_wgrad,
)


class PackedW(NamedTuple):
    """A row-0 feature map resident in the packed layout."""

    d: jax.Array  # (N, H*W/2, 2C)
    h: int        # image height (W/2 = d.shape[1] // h)

    @property
    def channels(self) -> int:
        return self.d.shape[-1] // 2

    @property
    def shape(self):
        """Logical NHWC shape (so width-summing callers treat packed and
        plain pieces uniformly)."""
        n, hp, c2 = self.d.shape
        return (n, self.h, 2 * (hp // self.h), c2 // 2)


def pack_w(x: jax.Array) -> PackedW:
    """(N,H,W,C) -> packed. A pure row-major reshape (one XLA copy at most)."""
    n, h, w, c = x.shape
    return PackedW(x.reshape(n, h * w // 2, 2 * c), h)


def unpack_w(p: PackedW) -> jax.Array:
    """packed -> (N,H,W,C)."""
    n, hp, c2 = p.d.shape
    w2 = hp // p.h
    return p.d.reshape(n, p.h, 2 * w2, c2 // 2)


def packed_supported(c: int, co: int) -> bool:
    """Shapes the packed kernel (and its VJP) handle: dense 128-lane rows."""
    return 2 * c <= 128 and 2 * co <= 128


def avg_pool2_packed(p: PackedW) -> jax.Array:
    """2x2 average pool of a packed row, returning plain NHWC (N,H/2,W/2,C).

    The packed array reshapes ROW-MAJOR (a bitcast, no data movement) to
    (N, H/2, h-parity, W/2, w-parity, C), so ``mean(axis=(2, 4))`` is the
    exact arithmetic of ops.pool.avg_pool2 on the unpacked tensor — same
    four elements, same reduction axes. The unpack_w -> avg_pool2 route
    instead paid a 6-d layout-changing reshape + copy at the row-0 -> row-1
    boundary (0.34 ms/step at b4 256², round-4 xplane, BASELINE.md).
    """
    n, hp, c2 = p.d.shape
    c = c2 // 2
    w2 = hp // p.h
    x = p.d.reshape(n, p.h // 2, 2, w2, 2, c)
    return jnp.mean(x, axis=(2, 4))


def head1x1_packed(p: PackedW, kernel: jax.Array,
                   bias: Optional[jax.Array],
                   compute_dtype=None) -> jax.Array:
    """1x1 conv of a packed row, returning plain NHWC (N, H, W, F).

    A 1x1 conv is a per-pixel matmul, so it runs IN packed space with the
    kernel embedded block-diagonally over the two w-phases:
    ``K2[(e, ci), (e, f)] = K[ci, f]``; the output's packed lane order
    (e, f) then unpacks by a pure row-major reshape. This removes the
    head boundary the plain route paid at b4 256² (round-4 xplane:
    unpack reshape 0.18 ms fwd + dgrad-conv 0.31 + conv-layout copy 0.41 +
    cotangent copy 0.15 + repack reshape 0.18 ms bwd — the cotangent now
    re-enters the packed backward as a reshape). Plain autodiff of the
    embedding is exact: dK arrives as the sum of the two diagonal blocks,
    identical to the unpacked conv's wgrad.
    """
    c, f = kernel.shape[2], kernel.shape[3]
    k = kernel.reshape(c, f)
    k2 = jnp.zeros((2 * c, 2 * f), kernel.dtype)
    k2 = k2.at[:c, :f].set(k).at[c:, f:].set(k)
    x = p.d
    if compute_dtype is not None and jnp.dtype(compute_dtype) != jnp.float32:
        x = x.astype(compute_dtype)
        k2 = k2.astype(compute_dtype)
    y = jnp.einsum("ntc,cf->ntf", x, k2).astype(jnp.float32)
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), 2)[None, None, :]
    n, hp, _ = y.shape
    w2 = hp // p.h
    return y.reshape(n, p.h, 2 * w2, f)


# ---------------------------------------------------------------------------
# Shifted views (XLA): the exact building blocks of the packed formulation,
# shared by the off-TPU forward, the wgrad, and the unit tests.
# ---------------------------------------------------------------------------


def _shift_h(xp: jax.Array, w2: int, dh: int) -> jax.Array:
    """A_dh: rows moved so A[t] = xp[t + dh*w2] with zero h-padding."""
    n, hp, c2 = xp.shape
    if dh == 0:
        return xp
    if dh < 0:
        return jnp.pad(xp, ((0, 0), (w2, 0), (0, 0)))[:, :hp]
    return jnp.pad(xp, ((0, 0), (0, w2), (0, 0)))[:, w2:]


def _alr(a: jax.Array, w2: int, c: int) -> jax.Array:
    """The cross-pair operand: lanes c.. from the previous pair's odd
    element, lanes ..c from the next pair's even element, zero w-padding
    at image-row boundaries."""
    n, hp, c2 = a.shape
    down = jnp.pad(a, ((0, 0), (1, 0), (0, 0)))[:, :hp]
    up = jnp.pad(a, ((0, 0), (0, 1), (0, 0)))[:, 1:]
    row = jnp.arange(hp) % w2
    first = (row == 0)[None, :, None]
    last = (row == w2 - 1)[None, :, None]
    lane_hi = (jnp.arange(c2) >= c)[None, None, :]
    zero = jnp.zeros_like(a)
    return jnp.where(lane_hi,
                     jnp.where(first, zero, down),
                     jnp.where(last, zero, up))


def _conv_packed_xla(xp: jax.Array, k: jax.Array, h: int,
                     compute_dtype) -> jax.Array:
    """Exact XLA twin of the packed Pallas conv (off-TPU fwd/dx path)."""
    n, hp, c2 = xp.shape
    c = c2 // 2
    w2 = hp // h
    bmid, blr = _build_b(k.astype(jnp.float32))
    cd = compute_dtype or jnp.float32
    acc = None
    for dh in (-1, 0, 1):
        a = _shift_h(xp, w2, dh)
        alr = _alr(a, w2, c)
        part = jnp.einsum("nrc,co->nro", a.astype(cd),
                          bmid[dh + 1].astype(cd),
                          preferred_element_type=jnp.float32)
        part = part + jnp.einsum("nrc,co->nro", alr.astype(cd),
                                 blr[dh + 1].astype(cd),
                                 preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    # Match the Pallas kernel's output-dtype-follows-input contract.
    return acc.astype(xp.dtype)


def _rot_t(k: jax.Array) -> jax.Array:
    """The dgrad kernel: rot180 + in/out swap (transpose of SAME 3x3/s1)."""
    return jnp.transpose(k[::-1, ::-1], (0, 1, 3, 2))


def _dk_from_db(dbmid: jax.Array, dblr: jax.Array, c: int, co: int
                ) -> jax.Array:
    """Transpose of _build_b: fold dB (3, 2C, 2Co) back to (3, 3, C, Co)."""
    dk = jnp.zeros((3, 3, c, co), dbmid.dtype)
    for e in (0, 1):
        for p in (0, 1):
            dk = dk.at[:, e - p + 1].add(
                dbmid[:, e * c:(e + 1) * c, p * co:(p + 1) * co])
    dk = dk.at[:, 0].add(dblr[:, c:2 * c, 0:co])
    dk = dk.at[:, 2].add(dblr[:, 0:c, co:2 * co])
    return dk


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def packed_conv3x3(xp: jax.Array, k: jax.Array, h: int,
                   compute_dtype=None) -> jax.Array:
    """3x3/s1/p1 conv fully in the packed layout, differentiable.

    xp (N, H*W/2, 2C) f32, k (3,3,C,Co) f32 -> (N, H*W/2, 2Co) f32.
    """
    return _packed_fwd_impl(xp, k, h, compute_dtype)


def _packed_fwd_impl(xp, k, h, compute_dtype):
    # compute_dtype None means f32 everywhere (tests/parity); production
    # passes bf16 explicitly.
    import jax as _jax
    if _jax.default_backend() != "tpu":
        return _conv_packed_xla(xp, k, h, compute_dtype)
    cd = compute_dtype or jnp.float32

    # Under an ambient mesh (jax.sharding.set_mesh, set by the Trainer) the
    # Mosaic call needs Manual axes — Auto-mode GSPMD has no partitioning
    # rule for it and would replicate the FULL global batch per chip. The
    # conv is per-sample, so shard_map over the data axis is exact and
    # collective-free (the same treatment as the Pallas norm kernels,
    # ops/pallas/instance_norm.py). Tensor-parallel or indivisible batches
    # fall back to the exact XLA twin, which GSPMD partitions natively.
    from jax.sharding import get_abstract_mesh

    am = get_abstract_mesh()
    if not am.empty and "data" in am.axis_names:
        if (am.shape.get("model", 1) > 1
                or xp.shape[0] % am.shape["data"]):
            return _conv_packed_xla(xp, k, h, compute_dtype)
        from jax.sharding import PartitionSpec as P
        return jax.shard_map(
            lambda xl, kl: conv3x3_packed(xl, kl, h=h, compute_dtype=cd),
            mesh=am, in_specs=(P("data"), P()), out_specs=P("data"),
            axis_names={"data"}, check_vma=False)(xp, k)
    return conv3x3_packed(xp, k, h=h, compute_dtype=cd)


def _packed_fwd(xp, k, h, compute_dtype):
    return _packed_fwd_impl(xp, k, h, compute_dtype), (xp, k)


def _wgrad_xla(xp, g, h, compute_dtype):
    """XLA twin of the wgrad kernel: materialized shifted views + einsums
    (the off-TPU path, and the round-3/4 TPU path — the views cost
    12.1 ms/step of HBM traffic at b4, see BASELINE.md round 5)."""
    n, hp, c2 = xp.shape
    c = c2 // 2
    w2 = hp // h
    cd = compute_dtype or jnp.float32
    dbmid = []
    dblr = []
    for dh in (-1, 0, 1):
        a = _shift_h(xp, w2, dh)
        alr = _alr(a, w2, c)
        dbmid.append(jnp.einsum("nrc,nro->co", a.astype(cd), g.astype(cd),
                                preferred_element_type=jnp.float32))
        dblr.append(jnp.einsum("nrc,nro->co", alr.astype(cd), g.astype(cd),
                               preferred_element_type=jnp.float32))
    return jnp.stack(dbmid), jnp.stack(dblr)


def _wgrad_impl(xp, g, h, compute_dtype):
    """dBmid/dBlr with the same backend/mesh dispatch as the forward: the
    in-VMEM Pallas wgrad kernel on TPU (shard_map + psum under an ambient
    data mesh), the einsum twin everywhere else. TACTILE_WGRAD=xla forces
    the twin (probe-only A/B knob, scripts/probe_disc.py)."""
    import os as _os

    import jax as _jax
    if (_jax.default_backend() != "tpu"
            or _os.environ.get("TACTILE_WGRAD") == "xla"):
        return _wgrad_xla(xp, g, h, compute_dtype)
    cd = compute_dtype or jnp.float32

    from jax.sharding import get_abstract_mesh

    # block_h=32 measured best on v5e (1.56 ms vs 2.48 at the fwd kernel's
    # th=8 for the 256^2 row-0 shape — fewer sequential grid steps amortize
    # the per-step view building); TACTILE_WGRAD_BH overrides for probes.
    bh = int(_os.environ.get("TACTILE_WGRAD_BH", "32"))

    am = get_abstract_mesh()
    if not am.empty and "data" in am.axis_names:
        if (am.shape.get("model", 1) > 1
                or xp.shape[0] % am.shape["data"]):
            return _wgrad_xla(xp, g, h, compute_dtype)
        from jax.sharding import PartitionSpec as P

        def shard(xl, gl):
            dbm, dbl = conv3x3_packed_wgrad(xl, gl, h=h, compute_dtype=cd,
                                            block_h=bh)
            return (jax.lax.psum(dbm, "data"), jax.lax.psum(dbl, "data"))

        return jax.shard_map(shard, mesh=am, in_specs=(P("data"), P("data")),
                             out_specs=(P(), P()), axis_names={"data"},
                             check_vma=False)(xp, g)
    return conv3x3_packed_wgrad(xp, g, h=h, compute_dtype=cd, block_h=bh)


def _packed_bwd(h, compute_dtype, res, g):
    xp, k = res
    n, hp, c2 = xp.shape
    c = c2 // 2
    co = k.shape[3]

    # dx: the transpose of a SAME-padded 3x3/s1 conv is the same conv with
    # the rotated-transposed kernel — the packed kernel again (2Co<=128 and
    # 2C<=128 both hold by construction).
    dxp = _packed_fwd_impl(g, _rot_t(k), h, compute_dtype)

    # dk: contract the shifted input views against the cotangent in VMEM
    # (Pallas wgrad kernel), then fold the dB matrices back through the
    # embedding transpose.
    dbmid, dblr = _wgrad_impl(xp, g, h, compute_dtype)
    dk = _dk_from_db(dbmid, dblr, c, co)
    return dxp, dk.astype(k.dtype)


packed_conv3x3.defvjp(_packed_fwd, _packed_bwd)


# ---------------------------------------------------------------------------
# Packed-space instance norm (+ activation): plain XLA — the stats are lane
# reductions folded over the two w-phases, which XLA fuses into the
# surrounding elementwise work (no custom kernel needed; differentiable).
# ---------------------------------------------------------------------------


def instance_norm_act_packed(p: PackedW, scale: Optional[jax.Array],
                             offset: Optional[jax.Array], act: Optional[str],
                             *, eps: float = 1e-5,
                             negative_slope: float = 0.2) -> PackedW:
    # The resident dtype follows the input (bf16-resident packed rows halve
    # every HBM pass — see BASELINE.md round 3); statistics always
    # accumulate in float32.
    out_dtype = p.d.dtype
    yp = p.d.astype(jnp.float32)
    n, hp, c2 = yp.shape
    c = c2 // 2
    s1 = jnp.sum(yp, axis=1)
    cnt = 2.0 * hp
    mean = (s1[:, :c] + s1[:, c:]) / cnt
    # Two-pass variance like ops/norm.py: the single-pass E[x^2]-m^2 form
    # loses enough bits through rsqrt at low-variance nodes to visibly
    # perturb deep-network gradients (measured: ~3% parameter-grad drift on
    # the nf=4 test net).
    d = yp - jnp.tile(mean, (1, 2))[:, None, :]
    s2 = jnp.sum(d * d, axis=1)
    var = (s2[:, :c] + s2[:, c:]) / cnt
    rstd = jax.lax.rsqrt(var + eps)
    sc = rstd if scale is None else rstd * scale[None, :]
    sh = -mean * sc if offset is None else offset[None, :] - mean * sc
    z = yp * jnp.tile(sc, (1, 2))[:, None, :] + jnp.tile(sh, (1, 2))[:, None, :]
    if act == "relu":
        z = jax.nn.relu(z)
    elif act == "leaky_relu":
        z = jax.nn.leaky_relu(z, negative_slope=negative_slope)
    return PackedW(z.astype(out_dtype), p.h)


# ---------------------------------------------------------------------------
# The node-level conv over a mixed piece list (the packed analogue of
# ops.conv.conv2d_multi): PackedW pieces run the packed kernel, lazy Up2
# pieces run the XLA folded up-conv and pack its output (one reshape), and
# plain NHWC pieces (the 3-channel stem) run the XLA conv and pack. The sum
# stays packed; the bias tiles over the two w-phases.
# ---------------------------------------------------------------------------


def conv2d_multi_packed(xs, kernel: jax.Array, *,
                        bias: Optional[jax.Array] = None,
                        compute_dtype=None) -> PackedW:
    """conv3x3/s1/p1 of the channel-concat of ``xs``, packed-resident.

    ``xs``: list of PackedW / Up2 / NHWC pieces whose channel widths sum to
    kernel.shape[2]. Returns PackedW with kernel.shape[3] channels.
    """
    from tactile_gan_tpu.ops.conv import conv2d
    from tactile_gan_tpu.ops.resize import Up2

    total_c = sum(t.shape[-1] for t in xs)
    if total_c != kernel.shape[2]:
        raise ValueError(
            f"input channels {total_c} != kernel input width {kernel.shape[2]}")
    co = kernel.shape[3]
    if 2 * co > 128:
        raise ValueError(f"packed conv needs 2*cout <= 128, got cout={co}")

    h = None
    for t in xs:
        if isinstance(t, PackedW):
            h = t.h
            break
        if isinstance(t, Up2):
            h = t.shape[1]
            break
        h = t.shape[1]
    out = None
    off = 0
    for t in xs:
        c = t.shape[-1]
        k_piece = (kernel if len(xs) == 1
                   else jax.lax.slice_in_dim(kernel, off, off + c, axis=2))
        if isinstance(t, PackedW):
            part = packed_conv3x3(t.d, k_piece, t.h, compute_dtype)
        elif isinstance(t, Up2):
            part = conv3x3_on_up2_packed(t.x, k_piece, compute_dtype)
        elif t.shape[2] % 2 == 0:
            # NHWC entry piece (the 3-channel stem): the w-packed conv
            # (ops/conv.py _pack2_w) emits (N,H,W/2,2co) with the packed
            # lane order (phase, co), so flattening it into the packed rows
            # is a pure row-major reshape. The plain-conv + pack_w route
            # instead cost two 1.2 ms f32[4,256,256,64] layout transposes
            # per step at the stem boundary (round-4 xplane, BASELINE.md).
            from tactile_gan_tpu.ops.conv import (
                _conv_packed_plain, _conv_plain3x3, _packed_with_plain_bwd,
            )
            y = _packed_with_plain_bwd(_conv_packed_plain, _conv_plain3x3,
                                       t, k_piece, compute_dtype)
            n_, hh, w2_, c2_ = y.shape
            part = y.reshape(n_, hh * w2_, c2_)
        else:
            part = pack_w(conv2d(t, k_piece, stride=1, padding=1,
                                 compute_dtype=compute_dtype)).d
        out = part if out is None else out + part
        off += c
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), 2)[None, None, :]
    # bf16 compute keeps the packed row RESIDENT in bf16: every row-0 HBM
    # pass (conv in/out, norm in/out, VJP residuals) halves. Same-scale
    # piece sums in bf16 cost ~1 ulp; stats/accumulators stay f32.
    if compute_dtype is not None and jnp.dtype(compute_dtype) != jnp.float32:
        out = out.astype(compute_dtype)
    return PackedW(out, h)


# ---------------------------------------------------------------------------
# The lazy-Up2 piece, packed-destination form.
#
# conv3x3(nearest_up2(b)) previously ran as one lhs-dilated conv whose
# output then needed a conv-layout -> rows-layout copy to join the packed
# accumulation (0.41 ms each at b4 256²), and whose autodiff dgrad reverses
# the full fine cotangent (0.58 ms each) — round-3 xplane. This form runs
# TWO plain 2x3-tap convs on the coarse grid (one per output h-parity q,
# output channels (p, co) = 2co = full MXU lanes) and lands in the packed
# row order with a single stack+reshape XLA fuses into the consumer:
# packed fine rows are ordered (a, q, b) = exactly stack(c0, c1, axis=2).
# Same taps as the materialized composition (tap sums in f32), ordinary
# cheap dgrad. 6 ci*co MACs per fine output vs the folded form's 4 — but
# at full lane occupancy, which wins wall-clock (BASELINE.md round 3).
# ---------------------------------------------------------------------------

_UP2_ROWS = {0: ((0,), (1, 2)), 1: ((0, 1), (2,))}
_UP2_COLS = {0: ((0,), (1, 2), ()), 1: ((), (0, 1), (2,))}


def _up2_phase_kernels(k3: jax.Array):
    """(3,3,ci,co) -> K0, K1 of (2,3,ci,2co) (see block comment)."""
    ci, co = k3.shape[2], k3.shape[3]
    ks = []
    for q in (0, 1):
        kq = jnp.zeros((2, 3, ci, 2 * co), k3.dtype)
        for di, dhs in enumerate(_UP2_ROWS[q]):
            for p in (0, 1):
                for dj, dws in enumerate(_UP2_COLS[p]):
                    for dh in dhs:
                        for dw in dws:
                            kq = kq.at[di, dj, :, p * co:(p + 1) * co].add(
                                k3[dh, dw])
        ks.append(kq)
    return ks[0], ks[1]


def conv3x3_on_up2_packed(b: jax.Array, k3: jax.Array,
                          compute_dtype=None) -> jax.Array:
    """conv3x3/s1/p1 of nearest_up2(b) directly into the packed fine rows.

    b (N, Hc, Wc, Ci), k3 (3,3,Ci,Co) -> (N, 2*Hc*Wc, 2Co) packed
    (fine H = 2*Hc, fine W/2 = Wc)."""
    from jax import lax

    n, hc, wc, ci = b.shape
    co = k3.shape[3]
    k0, k1 = _up2_phase_kernels(k3.astype(jnp.float32))
    outs = []
    for kq, pad_h in ((k0, (1, 0)), (k1, (0, 1))):
        if compute_dtype is not None and jnp.dtype(compute_dtype) != jnp.float32:
            b_c = b.astype(compute_dtype)
            k_c = kq.astype(compute_dtype)
            pet = None
        else:
            b_c, k_c, pet = b, kq, jnp.float32
        dn = lax.conv_dimension_numbers(b_c.shape, k_c.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            b_c, k_c, (1, 1), (pad_h, (1, 1)), dimension_numbers=dn,
            preferred_element_type=pet).astype(jnp.float32)
        outs.append(y)
    return jnp.stack(outs, axis=2).reshape(n, 2 * hc * wc, 2 * co)
