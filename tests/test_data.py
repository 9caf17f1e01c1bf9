"""Data pipeline tests: pairing rewrite, decode, batching/prefetch, and the
fused on-device augmentation + normalization stage."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from tactile_gan_tpu.data import (
    PairedDataset, get_dataset, list_images, preprocess_batch, tactile_paths_for,
)
from tactile_gan_tpu.data import augment as aug_mod

RNG = np.random.default_rng(5)


# ---------------------------------------------------------------------------
# Synthetic dataset fixture.
# ---------------------------------------------------------------------------

def make_dataset(root, n=6, size=32, target="rgb"):
    src_dir = os.path.join(root, "train", "source")
    tac_dir = os.path.join(root, "train", "tactile")
    os.makedirs(src_dir, exist_ok=True)
    os.makedirs(tac_dir, exist_ok=True)
    for i in range(n):
        arr = RNG.integers(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(src_dir, f"s_{i:04d}.png"))
        if target == "rgb":
            Image.fromarray(arr[:, :, ::-1]).save(
                os.path.join(tac_dir, f"t_{i:04d}.tiff"))
        else:
            for comp in ("axes", "grids", "content"):
                Image.fromarray(arr[:, :, 0]).save(
                    os.path.join(tac_dir, f"t_{i:04d}_{comp}.tiff"))
    return src_dir


def test_pairing_rewrite():
    got = tactile_paths_for("/d/train/source/s_0007.png", "rgb")
    assert got == {"rgb": "/d/train/tactile/t_0007.tiff"}
    got = tactile_paths_for("/d/train/source/s_0007.png", "ch")
    assert got == {
        "axes": "/d/train/tactile/t_0007_axes.tiff",
        "grids": "/d/train/tactile/t_0007_grids.tiff",
        "content": "/d/train/tactile/t_0007_content.tiff",
    }


@pytest.mark.parametrize("target", ["rgb", "ch"])
def test_dataset_load_pair(tmp_path, target):
    src_dir = make_dataset(str(tmp_path), n=4, target=target)
    ds = PairedDataset(src_dir, mode="train", aug=False, target=target)
    assert len(ds) == 4
    s, t = ds.load_pair(0)
    assert s.shape == (32, 32, 3) and s.dtype == np.uint8
    assert t.shape == (32, 32, 3) and t.dtype == np.uint8


def test_dataset_missing_tactile_raises(tmp_path):
    src_dir = make_dataset(str(tmp_path), n=2)
    os.remove(os.path.join(str(tmp_path), "train", "tactile", "t_0001.tiff"))
    ds = PairedDataset(src_dir, mode="train", target="rgb")
    with pytest.raises(FileNotFoundError):
        ds.load_pair(1)


def test_batch_iter_drop_last_and_padding(tmp_path):
    src_dir = make_dataset(str(tmp_path), n=6)
    ds = PairedDataset(src_dir, mode="train", target="rgb")

    out = list(ds.batches(4, drop_last=True, threads=2))
    assert len(out) == 1 and out[0][0].shape == (4, 32, 32, 3)

    out = list(ds.batches(4, drop_last=False, pad_to_batch=True, threads=2))
    assert len(out) == 2
    assert out[1][0].shape == (4, 32, 32, 3)  # padded to static shape
    assert out[1][2] == 2  # but only 2 valid rows


def test_batch_iter_shuffle_deterministic(tmp_path):
    src_dir = make_dataset(str(tmp_path), n=6)
    ds = PairedDataset(src_dir, mode="train", target="rgb")
    a = np.concatenate([b[0] for b in ds.batches(2, shuffle=True, seed=3)])
    b = np.concatenate([b[0] for b in ds.batches(2, shuffle=True, seed=3)])
    c = np.concatenate([b[0] for b in ds.batches(2, shuffle=True, seed=4)])
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_get_dataset_factory(tmp_path):
    src_dir = make_dataset(str(tmp_path), n=2)

    class Opt:
        no_aug = False
        target = "rgb"

    ds = get_dataset(src_dir, Opt(), mode="train")
    assert ds.aug and len(ds) == 2
    ds = get_dataset(src_dir, Opt(), mode="test")
    assert not ds.aug  # aug only ever applies in train mode


# ---------------------------------------------------------------------------
# On-device preprocessing.
# ---------------------------------------------------------------------------

def test_normalization_asymmetry():
    """Source → [-1,1], target stays [0,1] (SURVEY.md quirk 8;
    /root/reference/datasets/PairedDataset.py:52-58,85-90)."""
    src = np.full((1, 8, 8, 3), 255, np.uint8)
    tgt = np.full((1, 8, 8, 3), 255, np.uint8)
    s, t = preprocess_batch(jnp.array(src), jnp.array(tgt), jax.random.key(0),
                            augment=False)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), 1.0, atol=1e-6)
    src0 = np.zeros((1, 8, 8, 3), np.uint8)
    s, t = preprocess_batch(jnp.array(src0), jnp.array(src0), jax.random.key(0),
                            augment=False)
    np.testing.assert_allclose(np.asarray(s), -1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), 0.0)


def test_augment_deterministic_under_key():
    src = RNG.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    tgt = RNG.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    s1, t1 = preprocess_batch(jnp.array(src), jnp.array(tgt),
                              jax.random.key(9), augment=True)
    s2, t2 = preprocess_batch(jnp.array(src), jnp.array(tgt),
                              jax.random.key(9), augment=True)
    s3, _ = preprocess_batch(jnp.array(src), jnp.array(tgt),
                             jax.random.key(10), augment=True)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert not np.array_equal(np.asarray(s1), np.asarray(s3))


def test_flip_is_joint_and_exact(monkeypatch):
    """With p_flip=1 and p_affine=0 the pair must be mirrored exactly."""
    monkeypatch.setattr(aug_mod, "P_FLIP", 1.1)
    monkeypatch.setattr(aug_mod, "P_AFFINE", -0.1)
    src = jnp.array(RNG.uniform(size=(16, 16, 3)).astype(np.float32))
    tgt = jnp.array(RNG.uniform(size=(16, 16, 3)).astype(np.float32))
    s, t = aug_mod._augment_pair(src, tgt, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(s), np.asarray(src[:, ::-1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.asarray(tgt[:, ::-1]), atol=1e-6)


def test_warp_identity_and_scipy_parity():
    """_warp against scipy.ndimage.affine_transform (order=1, zero fill)."""
    from scipy import ndimage

    img = RNG.uniform(size=(20, 20, 1)).astype(np.float32)
    ident = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = aug_mod._warp(jnp.array(img), ident, nearest=False)
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)

    # A rotation+scale+shift matrix in (x, y) convention.
    th = np.deg2rad(10.0)
    a = np.array([[np.cos(th) / 1.1, -np.sin(th)],
                  [np.sin(th), np.cos(th) / 0.9]], np.float32)
    off = np.array([1.3, -0.7], np.float32)
    mat = jnp.array(np.concatenate([a, off[:, None]], axis=1))
    ours = np.asarray(aug_mod._warp(jnp.array(img), mat, nearest=False))[:, :, 0]
    # scipy wants the (row=y, col=x) convention: swap axes of the matrix.
    a_rc = a[::-1, ::-1].copy()
    off_rc = off[::-1].copy()
    theirs = ndimage.affine_transform(img[:, :, 0], a_rc, offset=off_rc,
                                      order=1, mode="constant", cval=0.0)
    # Border semantics differ by design: scipy zeroes any point sampling
    # outside the domain, while ours blends partial taps like
    # cv2/albumentations BORDER_CONSTANT. Compare only pixels whose bilinear
    # taps are fully in-bounds.
    h = w = img.shape[0]
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    src = a @ np.stack([gx.ravel(), gy.ravel()]) + off[:, None]
    sx, sy = src[0].reshape(h, w), src[1].reshape(h, w)
    valid = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    assert valid.sum() > 100
    np.testing.assert_allclose(ours[valid], theirs[valid], atol=1e-4)


def test_dense_warp_matches_gather_warp():
    """The matmul-based two-pass warp vs the exact gather warp: identity is
    exact; a rotation+scale agrees up to the sub-pixel kernel-skew of the
    two-pass decomposition (small for <=15 deg)."""
    img = RNG.uniform(size=(32, 32, 3)).astype(np.float32)
    ident = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(aug_mod._warp_dense(jnp.array(img), ident, nearest=False)),
        img, atol=1e-5)

    th = np.deg2rad(12.0)
    a = np.array([[np.cos(th) / 1.1, -np.sin(th)],
                  [np.sin(th), np.cos(th) / 0.9]], np.float32)
    off = np.array([1.3, -0.7], np.float32)
    mat = jnp.array(np.concatenate([a, off[:, None]], axis=1))
    dense = np.asarray(aug_mod._warp_dense(jnp.array(img), mat, nearest=False))
    gather = np.asarray(aug_mod._warp(jnp.array(img), mat, nearest=False))
    # mean deviation small; max bounded by the kernel-skew (white-noise
    # images are the worst case for comparing two valid resamplings)
    assert np.abs(dense - gather).mean() < 0.02
    assert np.abs(dense - gather).max() < 0.3

    # nearest: binary masks stay binary and translations are exact
    shift = jnp.array([[1.0, 0.0, 3.0], [0.0, 1.0, -2.0]])
    mask = (RNG.uniform(size=(32, 32, 1)) > 0.5).astype(np.float32)
    dn = np.asarray(aug_mod._warp_dense(jnp.array(mask), shift, nearest=True))
    gn = np.asarray(aug_mod._warp(jnp.array(mask), shift, nearest=True))
    np.testing.assert_array_equal(dn, gn)
    assert set(np.unique(dn).tolist()) <= {0.0, 1.0}


def test_augment_mask_nearest_preserves_value_set(monkeypatch):
    """The target is sampled nearest-neighbour (albumentations mask default):
    a binary mask stays binary under affine warping."""
    monkeypatch.setattr(aug_mod, "P_FLIP", -0.1)
    monkeypatch.setattr(aug_mod, "P_AFFINE", 1.1)
    src = jnp.array(RNG.uniform(size=(24, 24, 3)).astype(np.float32))
    mask = (RNG.uniform(size=(24, 24, 3)) > 0.5).astype(np.float32)
    _, t = aug_mod._augment_pair(src, jnp.array(mask), jax.random.key(4))
    vals = np.unique(np.asarray(t))
    assert set(vals.tolist()) <= {0.0, 1.0}


def test_missing_image_dir_raises(tmp_path):
    """A nonexistent image dir must fail fast — os.walk silently yields
    nothing, which made eval CLIs write empty Outputs trees on a mistyped
    --data path."""
    import pytest

    from tactile_gan_tpu.data.pairing import list_images

    with pytest.raises(FileNotFoundError, match="does not exist"):
        list_images(str(tmp_path / "nope"))


# ---------------------------------------------------------------------------
# Host-side augmentation (--host_aug): numpy twin of the device path.
# ---------------------------------------------------------------------------

def test_host_warp_matches_device_warp():
    """host_aug.warp_np is a transliteration of augment._warp — same matrix,
    same sampling, same blended border, to float32 precision."""
    from tactile_gan_tpu.data import host_aug

    img = RNG.uniform(0, 255, size=(24, 24, 3)).astype(np.float32)
    th = np.deg2rad(9.0)
    a = np.array([[np.cos(th) / 1.15, -np.sin(th)],
                  [np.sin(th), np.cos(th) / 0.85]], np.float32)
    off = np.array([2.1, -1.4], np.float32)
    mat = np.concatenate([a, off[:, None]], axis=1).astype(np.float32)

    for nearest in (False, True):
        ours = host_aug.warp_np(img, mat, nearest=nearest)
        dev = np.asarray(aug_mod._warp(jnp.array(img), jnp.array(mat),
                                       nearest=nearest))
        np.testing.assert_allclose(ours, dev, atol=2e-3)


def test_host_aug_batches_deterministic_and_joint(tmp_path):
    """Same (augment_seed, batch, row) → identical output; flips/affines are
    joint (a flipped source implies a flipped target)."""
    from tactile_gan_tpu.data import host_aug

    src_dir = make_dataset(str(tmp_path / "d"), n=4, size=32)
    ds = PairedDataset(src_dir, size=32, mode="train", aug=True)

    def collect():
        return [(s.copy(), t.copy()) for s, t, _ in ds.batches(
            2, shuffle=True, seed=3, threads=2, host_augment=True,
            augment_seed=17)]

    a, b = collect(), collect()
    assert len(a) == 2
    for (s1, t1), (s2, t2) in zip(a, b):
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(t1, t2)

    # Joint semantics: per-pair rng with forced flip (affine gated off).
    src = RNG.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    tgt = RNG.integers(0, 255, (16, 16, 3), dtype=np.uint8)

    class Seq:
        """First draw (flip) hits, later draws (affine gate) miss."""
        def __init__(self):
            self.n = 0
        def uniform(self, lo=0.0, hi=1.0, size=None):
            self.n += 1
            if size is not None:
                return np.full(size, (lo + hi) / 2.0)
            return 0.0 if self.n == 1 else 1.0

    s_out, t_out = host_aug.augment_pair_np(src, tgt, Seq())
    np.testing.assert_array_equal(s_out, src[:, ::-1])
    np.testing.assert_array_equal(t_out, tgt[:, ::-1])


def test_host_aug_trainer_smoke(tmp_path):
    """One epoch with --host_aug trains with finite losses and the step
    program compiled WITHOUT the device augmentation."""
    from test_train import build_dataset, tiny_cfg

    from tactile_gan_tpu.train import Trainer

    cfg = tiny_cfg(tmp_path, no_aug=False, host_aug=True, total_epochs=1)
    ds = build_dataset(cfg, n=4)
    tr = Trainer(cfg, ds, use_mesh=False)
    tr.train(progress=False)
    assert np.isfinite(tr.gen_loss).all() and np.isfinite(tr.disc_loss).all()


def test_warp_pil_matches_float_reference():
    """The production PIL warp (C, GIL-releasing) reproduces the float
    reference warp_np: bilinear within one uint8 step (PIL fixed-point
    weights), nearest identical except half-boundary picks (PIL rounds half
    up, numpy half to even), border exactly zero-blended via the pre-pad."""
    from tactile_gan_tpu.data import host_aug

    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    for i in range(5):
        mat = host_aug.inverse_affine_matrix_np(
            np.random.default_rng(50 + i), 64, 64)
        ref = np.clip(np.rint(host_aug.warp_np(
            img.astype(np.float32), mat, nearest=False)), 0, 255)
        got = host_aug.warp_pil(img, mat, nearest=False)
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
        ref_n = host_aug.warp_np(img.astype(np.float32), mat,
                                 nearest=True).astype(np.uint8)
        got_n = host_aug.warp_pil(img, mat, nearest=True)
        assert (got_n == ref_n).mean() > 0.99


def test_decoded_cache_returns_identical_pairs(tmp_path):
    """--cache_decoded: epoch 2 reads the RAM cache (decode happens once);
    results are identical, and --no-cache_decoded re-decodes."""
    from tactile_gan_tpu.data.dataset import PairedDataset

    sdir = tmp_path / "source"
    tdir = tmp_path / "tactile"
    sdir.mkdir(), tdir.mkdir()
    rng = np.random.default_rng(0)
    from PIL import Image
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
                        ).save(sdir / f"s_{i}.png")
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
                        ).save(tdir / f"t_{i}.tiff")

    ds = PairedDataset(str(sdir), mode="train", cache_decoded=True)
    first = [ds.load_pair(i) for i in range(3)]
    assert len(ds._cache) == 3
    again = [ds.load_pair(i) for i in range(3)]
    for (a0, b0), (a1, b1) in zip(first, again):
        assert a0 is a1 and b0 is b1  # cache hits, not re-decodes

    ds2 = PairedDataset(str(sdir), mode="train", cache_decoded=False)
    a = ds2.load_pair(0)
    assert len(ds2._cache) == 0
    np.testing.assert_array_equal(a[0], first[0][0])
