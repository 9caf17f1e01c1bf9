#!/usr/bin/env python
"""Generate a synthetic paired chart dataset for end-to-end validation.

Sources are random 2D line charts (colored lines + gray grid + black axes on
white); targets are their "tactile" rendering — the same geometry redrawn in
the high-contrast style the real dataset uses. Task 2 ('ch') emits the three
grayscale components (axes/grids/content) separately. This gives training
signal that a conditional GAN can actually learn (unlike noise pairs), so a
short run must visibly drop L1 and improve Dice.
"""

import argparse
import os

import numpy as np
from PIL import Image, ImageDraw


def draw_chart(rng, size):
    src = Image.new("RGB", (size, size), (255, 255, 255))
    d_src = ImageDraw.Draw(src)
    axes = Image.new("L", (size, size), 0)
    d_axes = ImageDraw.Draw(axes)
    grids = Image.new("L", (size, size), 0)
    d_grids = ImageDraw.Draw(grids)
    content = Image.new("L", (size, size), 0)
    d_content = ImageDraw.Draw(content)

    m = size // 8  # margin
    # grid lines
    for i in range(1, 5):
        x = m + i * (size - 2 * m) // 5
        d_src.line([(x, m), (x, size - m)], fill=(200, 200, 200), width=1)
        d_grids.line([(x, m), (x, size - m)], fill=255, width=1)
        y = m + i * (size - 2 * m) // 5
        d_src.line([(m, y), (size - m, y)], fill=(200, 200, 200), width=1)
        d_grids.line([(m, y), (size - m, y)], fill=255, width=1)
    # axes
    d_src.line([(m, m), (m, size - m)], fill=(0, 0, 0), width=2)
    d_src.line([(m, size - m), (size - m, size - m)], fill=(0, 0, 0), width=2)
    d_axes.line([(m, m), (m, size - m)], fill=255, width=3)
    d_axes.line([(m, size - m), (size - m, size - m)], fill=255, width=3)
    # data lines
    for _ in range(rng.integers(1, 3)):
        color = tuple(int(c) for c in rng.integers(0, 200, 3))
        xs = np.linspace(m, size - m, 8)
        ys = rng.uniform(m, size - m, 8)
        pts = list(zip(xs.astype(int).tolist(), ys.astype(int).tolist()))
        d_src.line(pts, fill=color, width=2)
        d_content.line(pts, fill=255, width=4)

    comp = np.stack([np.array(axes), np.array(grids), np.array(content)], -1)
    # rgb tactile: white geometry on black, thickened strokes
    rgb = np.clip(comp.astype(np.int32).sum(-1), 0, 255).astype(np.uint8)
    rgb = np.stack([rgb] * 3, -1)
    return np.array(src), rgb, comp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n_train", type=int, default=64)
    p.add_argument("--n_test", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    for split, n in (("train", args.n_train), ("test", args.n_test)):
        sdir = os.path.join(args.out, split, "source")
        tdir = os.path.join(args.out, split, "tactile")
        os.makedirs(sdir, exist_ok=True)
        os.makedirs(tdir, exist_ok=True)
        for i in range(n):
            src, rgb, comp = draw_chart(rng, args.size)
            Image.fromarray(src).save(os.path.join(sdir, f"s_{i:04d}.png"))
            Image.fromarray(rgb).save(os.path.join(tdir, f"t_{i:04d}.tiff"))
            for c, name in enumerate(("axes", "grids", "content")):
                Image.fromarray(comp[:, :, c]).save(
                    os.path.join(tdir, f"t_{i:04d}_{name}.tiff"))
    print(f"wrote {args.n_train}+{args.n_test} chart pairs to {args.out}")


if __name__ == "__main__":
    main()
