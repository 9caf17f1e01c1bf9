#!/usr/bin/env python
"""Augmentation-preview CLI — parity with
/root/reference/visualize_augmentation.py:42-127: renders raw vs augmented
source/target samples to PNG, compositing the channel-wise target with
additive blending (grid→G, axes→R, content→B).

Augmentation runs through the same on-device jitted stage as training.
"""

import argparse
import os

import numpy as np
from PIL import Image


def combine_channels(axes: np.ndarray, grid: np.ndarray,
                     content: np.ndarray) -> Image.Image:
    """Additive RGB blend (reference visualize_augmentation.py:8-29): grid in
    green, axes in red, content in blue."""
    h, w = axes.shape
    base = np.zeros((h, w, 3), dtype=np.uint8)
    base[..., 1] = np.clip(grid.astype(np.int32), 0, 255)
    base[..., 0] = np.clip(base[..., 0] + axes.astype(np.int32), 0, 255)
    base[..., 2] = np.clip(base[..., 2] + content.astype(np.int32), 0, 255)
    return Image.fromarray(base)


def save_pm1_image(arr_hwc: np.ndarray, path: str) -> None:
    """[-1,1] float HWC → PNG (reference's save_tensor_as_image, 31-40)."""
    u8 = np.clip((arr_hwc * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
    if u8.shape[2] == 1:
        u8 = u8[:, :, 0]
    Image.fromarray(u8).save(path)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Visualize dataset augmentation")
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="./augmentation_vis")
    parser.add_argument("--num_samples", type=int, default=5)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--target_mode", type=str, default="non_rgb",
                        choices=["rgb", "non_rgb"])
    # kept for reference CLI parity (the reference defines it but never uses
    # it — raw and augmented variants are always rendered side by side,
    # /root/reference/visualize_augmentation.py:120-121)
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--seed", type=int, default=21)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from tactile_gan_tpu.data.augment import preprocess_batch
    from tactile_gan_tpu.data.dataset import PairedDataset

    target = "rgb" if args.target_mode == "rgb" else "ch"
    ds = PairedDataset(args.data_dir, size=args.size, mode="train",
                       aug=True, target=target)
    os.makedirs(args.output_dir, exist_ok=True)

    n = min(args.num_samples, len(ds))
    for i in range(n):
        src_u8, tgt_u8 = ds.load_pair(i)
        batch_s = jnp.asarray(src_u8[None])
        batch_t = jnp.asarray(tgt_u8[None])
        raw_s, raw_t = preprocess_batch(batch_s, batch_t, jax.random.key(0),
                                        augment=False)
        aug_s, aug_t = preprocess_batch(batch_s, batch_t,
                                        jax.random.key(args.seed + i),
                                        augment=True)

        raw_s, raw_t = np.asarray(raw_s)[0], np.asarray(raw_t)[0]
        aug_s, aug_t = np.asarray(aug_s)[0], np.asarray(aug_t)[0]

        save_pm1_image(raw_s, os.path.join(args.output_dir,
                                           f"sample_{i}_source_raw.png"))
        save_pm1_image(aug_s, os.path.join(args.output_dir,
                                           f"sample_{i}_source_aug.png"))

        if target == "rgb":
            # Targets are [0,1]; map through the same [-1,1] writer the
            # reference uses by rescaling first.
            save_pm1_image(raw_t * 2 - 1, os.path.join(
                args.output_dir, f"sample_{i}_target_raw.png"))
            save_pm1_image(aug_t * 2 - 1, os.path.join(
                args.output_dir, f"sample_{i}_target_aug.png"))
        else:
            def comps(t):
                u8 = np.clip(t * 255.0, 0, 255).astype(np.uint8)
                return u8[:, :, 0], u8[:, :, 1], u8[:, :, 2]

            ax, gr, ct = comps(raw_t)
            combine_channels(ax, gr, ct).save(os.path.join(
                args.output_dir, f"sample_{i}_target_raw.png"))
            ax, gr, ct = comps(aug_t)
            combine_channels(ax, gr, ct).save(os.path.join(
                args.output_dir, f"sample_{i}_target_aug.png"))

    print(f"wrote {n} raw/augmented sample pairs to {args.output_dir}")


if __name__ == "__main__":
    main()
