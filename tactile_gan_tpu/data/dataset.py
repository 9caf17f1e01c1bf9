"""Host-side paired dataset: file discovery, decode, batching, prefetch.

Split of responsibilities (TPU-first, unlike the reference's per-sample CPU
workers at /root/reference/train.py:29): the host only walks/pairs/decodes
files into uint8 arrays and stacks batches; everything per-pixel
(augmentation + normalization) runs on-device in data/augment.py inside the
jitted train step.

Decode uses a thread pool (`threads`, the reference's --threads flag) and the
batch iterator prefetches one batch ahead so decode overlaps device compute.

A behavioral fix over the reference: a missing tactile file raises
FileNotFoundError immediately instead of print-then-crash-on-unbound-variable
(/root/reference/datasets/PairedDataset.py:69-70,77-78).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Iterator, List, Tuple

import numpy as np
from PIL import Image

from tactile_gan_tpu.data.pairing import list_images, tactile_paths_for


class PairedDataset:
    """Map-style paired dataset of (source RGB, tactile target) uint8 arrays."""

    def __init__(self, img_dir: str, size: int = 256, mode: str = "train",
                 aug: bool = False, target: str = "rgb",
                 cache_decoded: bool = True):
        self.img_dir = img_dir
        self.size = size
        self.mode = mode
        self.aug = aug and mode == "train"
        self.target = target
        self.images: List[str] = list_images(img_dir)
        # Decoded-pair RAM cache: PNG/TIFF decode repeats identically every
        # epoch (the reference's DataLoader re-decodes too); ~200 KB/pair at
        # 256² means ~300 MB for a reference-sized dataset. --no-cache_decoded
        # for datasets that do not fit host RAM.
        self.cache_decoded = cache_decoded
        self._cache: dict = {}

    def __len__(self) -> int:
        return len(self.images)

    def load_pair(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (source, target) HWC uint8."""
        if self.cache_decoded:
            hit = self._cache.get(i)
            if hit is not None:
                return hit
        source = np.asarray(Image.open(self.images[i]).convert("RGB"))
        paths = tactile_paths_for(self.images[i], self.target)
        try:
            if self.target == "rgb":
                tactile = np.asarray(Image.open(paths["rgb"]).convert("RGB"))
            else:
                chans = [
                    np.asarray(Image.open(paths[k]).convert("L"))
                    for k in ("axes", "grids", "content")
                ]
                tactile = np.stack(chans, axis=-1)
        except FileNotFoundError as e:
            raise FileNotFoundError(
                f"missing tactile component(s) for {self.images[i]}: {paths}"
            ) from e
        if self.cache_decoded:
            # Freeze the cached arrays: every consumer across epochs gets the
            # SAME ndarrays (flip views / warp / stack all copy today), so an
            # accidental future in-place edit must raise instead of silently
            # corrupting the dataset for all later epochs (ADVICE r3).
            source.setflags(write=False)
            tactile.setflags(write=False)
            # dict writes are atomic under the GIL; worst case two decode
            # threads race and one result wins — both are identical.
            self._cache[i] = (source, tactile)
        return source, tactile

    # ------------------------------------------------------------------
    # Batching.
    # ------------------------------------------------------------------

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        threads: int = 8,
        pad_to_batch: bool = False,
        local_rows: slice = slice(None),
        host_augment: bool = False,
        augment_seed: int = 0,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, int]]:
        """Yield (source u8 [B,H,W,3], target u8 [B,H,W,3], valid_count).

        With ``pad_to_batch`` the final short batch is padded by repeating its
        last sample so every device batch has one static shape;
        ``valid_count`` tells the consumer how many rows are real.

        ``local_rows`` restricts decode + output to a contiguous row range of
        each (padded) global batch — multi-host data parallelism: every
        process walks the same shuffled order but only materializes its own
        shard (parallel/mesh.py local_batch_rows). valid_count stays global.

        ``host_augment`` applies the joint flip+affine in the decode pool
        (data/host_aug.py) instead of on-device, pipelined one batch ahead of
        the step; each sample's numpy Generator is seeded by
        (augment_seed, batch_index, global_row), so results are deterministic
        and identical across multi-host shard boundaries.
        """
        order = np.arange(len(self.images))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        if drop_last:
            order = order[: (len(order) // batch_size) * batch_size]
        if len(order) == 0:
            return iter(())

        chunks = [order[i:i + batch_size]
                  for i in range(0, len(order), batch_size)]

        def generator():
            # Separate pools: `decode` fans decoding out over --threads
            # workers; `staging` (1 worker) assembles the *next* batch while
            # the caller consumes the current one (double buffering).
            with cf.ThreadPoolExecutor(max_workers=max(1, threads)) as decode, \
                    cf.ThreadPoolExecutor(max_workers=1) as staging:

                if host_augment:
                    from tactile_gan_tpu.data.host_aug import augment_pair_np

                def assemble(chunk_i: int, idx: np.ndarray):
                    valid = len(idx)
                    idx = list(idx)
                    if pad_to_batch and valid < batch_size:
                        idx += [idx[-1]] * (batch_size - valid)
                    rows = list(range(len(idx)))[local_rows]
                    idx = idx[local_rows]

                    def load_one(args):
                        row, i = args
                        pair = self.load_pair(i)
                        if not host_augment:
                            return pair
                        rng = np.random.default_rng(
                            (augment_seed, chunk_i, row))
                        return augment_pair_np(pair[0], pair[1], rng)

                    pairs = list(decode.map(load_one, zip(rows, idx)))
                    srcs = np.stack([p[0] for p in pairs])
                    tgts = np.stack([p[1] for p in pairs])
                    return srcs, tgts, valid

                pending = staging.submit(assemble, 0, chunks[0])
                for ci, nxt in enumerate(chunks[1:], start=1):
                    ready = pending.result()
                    pending = staging.submit(assemble, ci, nxt)
                    yield ready
                yield pending.result()

        return generator()


def get_dataset(img_dir: str, opt, mode: str = "train") -> PairedDataset:
    """Factory matching /root/reference/datasets/datasets.py:3-6."""
    return PairedDataset(img_dir, size=getattr(opt, "image_size", 256),
                         mode=mode, aug=not opt.no_aug, target=opt.target,
                         cache_decoded=getattr(opt, "cache_decoded", True))
