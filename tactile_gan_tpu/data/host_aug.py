"""Host-side (numpy) joint augmentation — the pipelined alternative to the
on-device path in data/augment.py.

Round-2 xplane analysis (BASELINE.md) put the on-device augmentation at
~11 ms of the ~100 ms b4 step, stuck at the TPU's tile-granular gather floor
(four index-rewrites measured and rejected). The decode thread pool, however,
idles while the device steps — so running the SAME flip+affine in numpy
inside that pool, one batch ahead of the device, removes the gathers from the
device program entirely (--host_aug; measurements in BASELINE.md).

Semantics match data/augment.py (same matrix formula, same bilinear/nearest
sampling, same blended zero border), with one reference-faithful difference:
like the reference's albumentations pipeline
(/root/reference/datasets/PairedDataset.py:80-90) it operates on uint8 pixels
and rounds the bilinear result back to uint8, where the device path stays in
float. Randomness comes from numpy Generators seeded per (run, epoch, batch,
row), so results are deterministic and independent of worker scheduling.

The production warp runs through PIL's C affine transform (measured round 3:
the numpy fancy-index warp at ~6 ms/pair HOLDS THE GIL, which starved the
main thread's step dispatch through the axon relay — end-to-end b4 fell
38.97 -> 31.47 img/s with the numpy path even though the decode pool had
spare capacity; PIL's transform is ~2x faster AND releases the GIL). PIL
samples at ``A @ (dst + 0.5) - 0.5`` with fixed-point weights, so the
coefficients are recentred and the image pre-padded with 2 zero pixels to
reproduce the blended zero border; the result matches the float reference
``warp_np`` to within 1 uint8 step (bilinear) and on >99.7% of pixels
(nearest — PIL rounds half up where numpy rounds half to even).
``warp_np`` remains the exact float twin the parity tests pin against.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from tactile_gan_tpu.data import augment as _dev

# Shared hyper-parameters — the device module is the single source of truth.
TRANSLATE_PCT = _dev.TRANSLATE_PCT
SCALE_RANGE = _dev.SCALE_RANGE
ROTATE_DEG = _dev.ROTATE_DEG
P_FLIP = _dev.P_FLIP
P_AFFINE = _dev.P_AFFINE


def inverse_affine_matrix_np(rng: np.random.Generator, h: int, w: int
                             ) -> np.ndarray:
    """Numpy twin of augment._inverse_affine_matrix: sample an
    albumentations-style affine, return the 2x3 output→source matrix."""
    tx, ty = rng.uniform(-TRANSLATE_PCT, TRANSLATE_PCT, 2) * np.array([w, h])
    sx, sy = rng.uniform(SCALE_RANGE[0], SCALE_RANGE[1], 2)
    theta = np.deg2rad(rng.uniform(-ROTATE_DEG, ROTATE_DEG))
    cos, sin = np.cos(theta), np.sin(theta)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    inv_rot = np.array([[cos, sin], [-sin, cos]])
    inv_scale = np.array([[1.0 / sx, 0.0], [0.0, 1.0 / sy]])
    a = inv_scale @ inv_rot
    center = np.array([cx, cy])
    offset = -a @ (np.array([tx, ty]) + center) + center
    return np.concatenate([a, offset[:, None]], axis=1).astype(np.float32)


def warp_np(img: np.ndarray, mat: np.ndarray, *, nearest: bool) -> np.ndarray:
    """Gather-based inverse warp, float32 HWC — numpy transliteration of
    augment._warp (same sampling, same blended zero border)."""
    h, w = img.shape[0], img.shape[1]
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    src = mat[:, :2] @ np.stack([gx.ravel(), gy.ravel()]) + mat[:, 2:]
    sx, sy = src[0].reshape(h, w), src[1].reshape(h, w)

    flat = img.reshape(h * w, -1)

    def sample(ix, iy):
        inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        idx = np.clip(iy, 0, h - 1) * w + np.clip(ix, 0, w - 1)
        vals = flat[idx.ravel()].reshape(h, w, -1)
        return np.where(inb[..., None], vals, 0.0)

    if nearest:
        return sample(np.round(sx).astype(np.int32),
                      np.round(sy).astype(np.int32))

    x0 = np.floor(sx).astype(np.int32)
    y0 = np.floor(sy).astype(np.int32)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    top = sample(x0, y0) * (1 - fx) + sample(x0 + 1, y0) * fx
    bot = sample(x0, y0 + 1) * (1 - fx) + sample(x0 + 1, y0 + 1) * fx
    return top * (1 - fy) + bot * fy


_PAD = 2  # covers every bilinear tap that straddles the image border


def warp_pil(img_u8: np.ndarray, mat: np.ndarray, *, nearest: bool
             ) -> np.ndarray:
    """GIL-releasing C warp with ``warp_np`` semantics (see module docstring
    for the ±1-ULP fixed-point caveat).

    PIL's AFFINE transform evaluates the source position at
    ``A @ (dst + 0.5) + t - 0.5`` (output pixel centres, then a half-pixel
    shift back), so the offset column is recentred; the 2-pixel zero
    pre-pad makes out-of-bounds taps read true zeros, reproducing the
    blended zero border instead of PIL's edge clamp.
    """
    from PIL import Image

    h, w = img_u8.shape[0], img_u8.shape[1]
    padded = np.zeros((h + 2 * _PAD, w + 2 * _PAD, img_u8.shape[2]),
                      np.uint8)
    padded[_PAD:-_PAD, _PAD:-_PAD] = img_u8
    a, b, c = (float(v) for v in mat[0])
    d, e, f = (float(v) for v in mat[1])
    coeffs = (a, b, c - (a + b) * 0.5 + 0.5 + _PAD,
              d, e, f - (d + e) * 0.5 + 0.5 + _PAD)
    out = Image.fromarray(padded).transform(
        (w, h), Image.AFFINE, coeffs,
        resample=Image.NEAREST if nearest else Image.BILINEAR, fillcolor=0)
    return np.asarray(out)


def augment_pair_np(src_u8: np.ndarray, tgt_u8: np.ndarray,
                    rng: np.random.Generator
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Joint flip+affine on one uint8 (source, target) pair.

    Like the reference's albumentations call, the result stays uint8 (the
    bilinear source is rounded; the nearest-sampled target is exact)."""
    if rng.uniform() < P_FLIP:
        src_u8 = src_u8[:, ::-1]
        tgt_u8 = tgt_u8[:, ::-1]
    h, w = src_u8.shape[0], src_u8.shape[1]
    mat = inverse_affine_matrix_np(rng, h, w)
    if rng.uniform() < P_AFFINE:
        src_u8 = warp_pil(src_u8, mat, nearest=False)
        tgt_u8 = warp_pil(tgt_u8, mat, nearest=True)
    return np.ascontiguousarray(src_u8), np.ascontiguousarray(tgt_u8)
