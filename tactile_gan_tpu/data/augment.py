"""Fused on-device preprocessing: joint augmentation + normalization.

The reference does this per-sample on CPU worker processes
(/root/reference/datasets/PairedDataset.py:80-90): albumentations
HorizontalFlip(p=.5) + Affine(translate ±10%, scale 0.8–1.2, rotate ±15°,
p=.5) applied jointly to image+mask, then the asymmetric normalization —
source → [-1,1], target → [0,1] (SURVEY.md quirk 8).

Here the whole stage is one jitted, vmapped function over the uint8 batch:
the host only decodes bytes; flips, affine warps and normalization all run on
the TPU and fuse into the training step's program. Augmentation geometry
matches albumentations defaults: image sampled bilinearly, mask
nearest-neighbour, constant-zero border fill, transform about the image
center with independent per-axis scale (keep_ratio=False default).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

TRANSLATE_PCT = 0.1
SCALE_RANGE = (0.8, 1.2)
ROTATE_DEG = 15.0
P_FLIP = 0.5
P_AFFINE = 0.5


def _inverse_affine_matrix(key: jax.Array, h: int, w: int) -> jax.Array:
    """Sample one albumentations-style affine and return the 2x3 matrix that
    maps *output* pixel coords (x, y) to source coords."""
    k_t, k_s, k_r = jax.random.split(key, 3)
    tx, ty = jax.random.uniform(k_t, (2,), minval=-TRANSLATE_PCT,
                                maxval=TRANSLATE_PCT) * jnp.array([w, h])
    sx, sy = jax.random.uniform(k_s, (2,), minval=SCALE_RANGE[0],
                                maxval=SCALE_RANGE[1])
    theta = jnp.deg2rad(jax.random.uniform(k_r, (), minval=-ROTATE_DEG,
                                           maxval=ROTATE_DEG))
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # Forward: p_out = T(center) R S T(-center) p_in + t. Invert analytically:
    # p_in = S^-1 R^-1 (p_out - t - c) + c
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    inv_rot = jnp.array([[cos, sin], [-sin, cos]])
    inv_scale = jnp.array([[1.0 / sx, 0.0], [0.0, 1.0 / sy]])
    a = inv_scale @ inv_rot
    center = jnp.array([cx, cy])
    offset = -a @ (jnp.array([tx, ty]) + center) + center
    return jnp.concatenate([a, offset[:, None]], axis=1)  # (2, 3)


def _warp_dense(img: jax.Array, mat: jax.Array, *, nearest: bool) -> jax.Array:
    """Inverse-warp one HWC image by the 2x3 matrix — gather-free.

    Classic Catmull–Smith two-pass decomposition: a horizontal then a
    vertical 1-D resample, each expressed as a dense interpolation-weight
    matrix (from broadcasted iota comparisons) contracted with the image.

    MEASURED on v5e at (4,256,256,3): the per-row contractions are
    latency-bound tiny matmuls (N=3), ~75 ms/batch via einsum and ~30 ms via
    fused multiply-reduce — versus ~31 ms for the WHOLE gather-based
    augmentation pipeline. The gather formulation (_warp) therefore remains
    the production path; this kernel is kept as the evaluated alternative
    and for shapes where channel counts make the matmuls efficient.

    Zero fill outside (partial blending at borders, like cv2
    BORDER_CONSTANT). Bilinear for images, exact one-tap nearest for masks.
    Requires |a11| not tiny — guaranteed by the <=15 deg rotation range.
    """
    h, w, _ = img.shape
    a00, a01, tx = mat[0, 0], mat[0, 1], mat[0, 2]
    a10, a11, ty = mat[1, 0], mat[1, 1], mat[1, 2]

    xo = jnp.arange(w, dtype=jnp.float32)
    yo = jnp.arange(h, dtype=jnp.float32)

    def weights(coords, size):
        """coords: target source-positions, shape (..., n_out). Returns
        (..., n_out, size) kernel weights."""
        taps = jnp.arange(size, dtype=jnp.float32)
        d = coords[..., None] - taps
        if nearest:
            return (jnp.round(coords)[..., None] == taps).astype(jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(d))

    # Pass 1 (horizontal): tmp[y, x] = sum_j k(xs_h(y, x) - j) img[y, j]
    # where xs_h is the source-x evaluated with yo recovered from the source
    # row index y (Catmull–Smith consistency).
    xs_h = (a00 * xo[None, :]
            + a01 * (yo[:, None] - a10 * xo[None, :] - ty) / a11 + tx)
    w1 = weights(xs_h, w)                       # (h, w, w_src)
    tmp = jnp.einsum("ywj,yjc->ywc", w1, img.astype(jnp.float32),
                     preferred_element_type=jnp.float32)

    # Pass 2 (vertical): out[y, x] = sum_i k(ys(y, x) - i) tmp[i, x]
    ys = a10 * xo[None, :] + a11 * yo[:, None] + ty   # (h_out, w)
    w2 = weights(jnp.swapaxes(ys, 0, 1), h)           # (w, h_out, h_src)
    out = jnp.einsum("xyi,ixc->yxc", w2, tmp,
                     preferred_element_type=jnp.float32)
    return out


def _warp(img: jax.Array, mat: jax.Array, *, nearest: bool) -> jax.Array:
    """Gather-based inverse warp — the production path (exact direct 2-D
    sampling; measured faster than the dense two-pass variant above at this
    workload's channel counts)."""
    h, w, _ = img.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (h, w), x-major coords
    src = mat[:, :2] @ jnp.stack([gx.ravel(), gy.ravel()]) + mat[:, 2:]
    sx, sy = src[0].reshape(h, w), src[1].reshape(h, w)

    def sample(ix, iy):
        inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        flat = img.reshape(h * w, -1)
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        vals = flat[idx.ravel()].reshape(h, w, -1)
        return jnp.where(inb[..., None], vals, 0.0)

    if nearest:
        return sample(jnp.round(sx).astype(jnp.int32),
                      jnp.round(sy).astype(jnp.int32))

    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    top = sample(x0, y0) * (1 - fx) + sample(x0 + 1, y0) * fx
    bot = sample(x0, y0 + 1) * (1 - fx) + sample(x0 + 1, y0 + 1) * fx
    return top * (1 - fy) + bot * fy


def _augment_pair(src: jax.Array, tgt: jax.Array, key: jax.Array):
    """Joint flip+affine on one (source, target) pair of float [0,1] HWC."""
    k_pf, k_pa, k_aff = jax.random.split(key, 3)

    do_flip = jax.random.uniform(k_pf) < P_FLIP
    src = jnp.where(do_flip, src[:, ::-1], src)
    tgt = jnp.where(do_flip, tgt[:, ::-1], tgt)

    h, w = src.shape[0], src.shape[1]
    mat = _inverse_affine_matrix(k_aff, h, w)
    do_aff = jax.random.uniform(k_pa) < P_AFFINE
    src = jnp.where(do_aff, _warp(src, mat, nearest=False), src)
    tgt = jnp.where(do_aff, _warp(tgt, mat, nearest=True), tgt)
    return src, tgt


@functools.partial(jax.jit, static_argnames=("augment",))
def preprocess_batch(
    source_u8: jax.Array,
    target_u8: jax.Array,
    key: jax.Array,
    augment: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """uint8 NHWC batches → (source in [-1,1], target in [0,1]) float32.

    Augmentation (train only) happens before normalization like the
    reference, so border fill is black in pixel space.
    """
    src = source_u8.astype(jnp.float32) / 255.0
    tgt = target_u8.astype(jnp.float32) / 255.0
    if augment:
        keys = jax.random.split(key, src.shape[0])
        src, tgt = jax.vmap(_augment_pair)(src, tgt, keys)
    src = src * 2.0 - 1.0  # Normalize((.5,.5,.5), (.5,.5,.5))
    return src, tgt
