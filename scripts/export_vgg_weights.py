#!/usr/bin/env python
"""Export pretrained VGG16 feature weights for perceptual loss v1.

Run this on any machine that has torchvision + network access, then copy the
resulting .npz next to the dataset and point --vgg_weights (or
TACTILE_GAN_VGG_WEIGHTS) at it. The training container itself has no
torchvision and no egress, so the weights must be staged like any other
dataset artifact.

Keys follow the torchvision state-dict naming (features.<idx>.weight OIHW /
features.<idx>.bias) for the conv layers up to relu4_3 — exactly the blocks
the reference slices (/root/reference/util.py:104-107).
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="vgg16_features.npz")
    args = parser.parse_args()

    import torchvision

    model = torchvision.models.vgg16(weights="IMAGENET1K_V1")
    sd = model.features.state_dict()
    arrays = {}
    for idx in (0, 2, 5, 7, 10, 12, 14, 17, 19, 21):
        arrays[f"features.{idx}.weight"] = sd[f"{idx}.weight"].numpy().astype(np.float32)
        arrays[f"features.{idx}.bias"] = sd[f"{idx}.bias"].numpy().astype(np.float32)
    np.savez(args.out, **arrays)
    print(f"wrote {args.out} ({len(arrays)} arrays)")


if __name__ == "__main__":
    main()
