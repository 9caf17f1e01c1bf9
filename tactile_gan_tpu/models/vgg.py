"""Frozen VGG16 feature tower for perceptual loss v1.

The reference builds it from pretrained torchvision VGG16 split at feature
indices [:4], [4:9], [9:16], [16:23] (/root/reference/util.py:104-107), i.e.
the activations after relu1_2, relu2_2, relu3_3 and relu4_3.

This environment has no torchvision and no network egress, so pretrained
weights must be supplied as a local ``.npz`` (``--vgg_weights`` /
``TACTILE_GAN_VGG_WEIGHTS``) with keys ``features.{idx}.weight`` (OIHW) /
``features.{idx}.bias`` — the torchvision state-dict naming, so a one-line
export script produces it. Without weights the tower falls back to a
*deterministic random* initialization (fixed seed): random VGG features still
define a usable perceptual metric, and the loss stays well-defined, but they
are not ImageNet features — a warning is emitted once.
"""

from __future__ import annotations

import os
import warnings
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tactile_gan_tpu.ops.conv import conv2d

# (conv torchvision feature-index, out_channels), block-split as in the
# reference; 'M' marks the 2x2 max-pool preceding the conv.
_BLOCKS = (
    ((0, 64), (2, 64)),                     # -> relu1_2   (features[:4])
    (("M", None), (5, 128), (7, 128)),      # -> relu2_2   (features[4:9])
    (("M", None), (10, 256), (12, 256), (14, 256)),   # -> relu3_3
    (("M", None), (17, 512), (19, 512), (21, 512)),   # -> relu4_3
)

ENV_WEIGHTS = "TACTILE_GAN_VGG_WEIGHTS"
_warned = False


def resolve_weights_path(weights_path: str = "") -> str:
    """The .npz path that load_vgg_features would use; '' if none exists."""
    path = weights_path or os.environ.get(ENV_WEIGHTS, "")
    return path if path and os.path.exists(path) else ""


def fallback_banner() -> str:
    """Unmissable per-run notice for the random-feature fallback (the
    one-time UserWarning is easy to lose in a long training log)."""
    return (
        "=" * 72 + "\n"
        "!! PERCEPTUAL LOSS V1 IS USING DETERMINISTIC *RANDOM* VGG FEATURES !!\n"
        "No pretrained VGG16 weights were found. The reference optimizes\n"
        "against ImageNet-pretrained VGG16 (/root/reference/util.py:104-107);\n"
        "this run optimizes a different perceptual objective. Supply weights\n"
        f"via --vgg_weights or ${ENV_WEIGHTS} (see scripts/export_vgg_weights.py),\n"
        "or silence this by training with --lambda_per 0 or --version 2.\n"
        "params.txt will record vgg_random_fallback=true for this run.\n"
        + "=" * 72)


def load_vgg_features(weights_path: str = "") -> dict:
    """Returns {'features.<idx>.kernel': HWIO, 'features.<idx>.bias': [C]}."""
    global _warned
    path = resolve_weights_path(weights_path)
    params = {}
    if path:
        raw = np.load(path)
        for block in _BLOCKS:
            for idx, _ in block:
                if idx == "M":
                    continue
                w = raw[f"features.{idx}.weight"]  # OIHW
                b = raw[f"features.{idx}.bias"]
                params[f"features.{idx}.kernel"] = jnp.asarray(
                    w.transpose(2, 3, 1, 0), jnp.float32)
                params[f"features.{idx}.bias"] = jnp.asarray(b, jnp.float32)
        return params

    if not _warned:
        warnings.warn(
            "No pretrained VGG16 weights found (set --vgg_weights or "
            f"{ENV_WEIGHTS}); perceptual loss v1 falls back to deterministic "
            "random VGG features.")
        _warned = True
    key = jax.random.key(16)
    cin = 3
    for block in _BLOCKS:
        for idx, cout in block:
            if idx == "M":
                continue
            key, k1 = jax.random.split(key)
            fan_in = 3 * 3 * cin
            params[f"features.{idx}.kernel"] = (
                jax.random.normal(k1, (3, 3, cin, cout), jnp.float32)
                * np.sqrt(2.0 / fan_in))
            params[f"features.{idx}.bias"] = jnp.zeros((cout,), jnp.float32)
            cin = cout
    return params


def vgg_features_apply(params: dict, x: jax.Array) -> Tuple[jax.Array, ...]:
    """x: NHWC float32 (already ImageNet-normalized). Returns the 4 block
    outputs. Convs run in bf16 on TPU via XLA's default; weights stay f32 and
    are non-trainable (never part of any optimizer state)."""
    outs = []
    for block in _BLOCKS:
        for idx, _ in block:
            if idx == "M":
                n, h, w, c = x.shape
                x = jnp.max(x.reshape(n, h // 2, 2, w // 2, 2, c), axis=(2, 4))
            else:
                x = conv2d(x, params[f"features.{idx}.kernel"], padding=1,
                           bias=params[f"features.{idx}.bias"])
                x = jax.nn.relu(x)
        outs.append(x)
    return tuple(outs)
